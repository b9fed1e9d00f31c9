"""Fifth coverage batch: product-analytics trio (sessionization,
last-touch attribution, OHLC resample) and two training-pipeline
curation ops (hashed-linear quality scoring, deterministic source
mixing).

The event trio completes the behavioral-analytics family started in
registry_graph.py (e1 funnel, e2 retention, e3 transitions, e4
latency); the curation pair extends the Gopher/C4/trigram family
(registry_curation.py) with the classifier-scoring and data-mixing
steps between filtering and training. Oracle conventions follow
plans/registry.py: identical aliases both sides, BIGINT-aligned
integers, exact decimal sums, integer microsecond diffs (the e4
lesson: second-granularity epoch() truncates sub-second parts
differently across engines), total-order (ts, event_id) everywhere a
winner is picked, and no division in any compared column.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.operators.curation import (
    hashed_linear_score,
    mixture_sample,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.events import (
    last_touch_attribution,
    resample_ohlc,
    sessionize,
)
from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    register,
    t,
)

# ------------------------------------------------- event analytics

@register(
    "e5_sessionization",
    """WITH g AS (
         SELECT user_id, event_type, ts, event_id,
                epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                    AS gap_us
         FROM events),
       s AS (
         SELECT user_id, event_type, ts,
                SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS session_idx
         FROM g)
       SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT)
                  AS duration_us,
              CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
       FROM s GROUP BY user_id, session_idx""",
    survey="§2.5/§7.5 ext (gap sessionization)",
    note="30-min-gap sessionization (operators/events.py:sessionize) "
         "— the batch twin of the streaming session window "
         "(stream_session): same session boundaries, derived here by "
         "a lag-gap window + running sum instead of state. One "
         "shuffle on user_id shared by the window and the session "
         "groupBy; duration is an exact integer microsecond diff")
def e5_sessionization(spark, sf_dir):
    return sessionize(t(spark, sf_dir, "events"), gap_minutes=30)


# events hold 5 types; the 4 non-conversion channels get dense codes
# (sorted order) so the carry encoding matches the oracle CASE ladder
_CHANNELS = {"click": 1, "error": 2, "signup": 3, "view": 4}


@register(
    "e6_attribution_last_touch",
    """WITH r AS (
         SELECT user_id, event_type, ts, event_id,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn
         FROM events),
       c AS (
         SELECT user_id, event_type,
                max(CASE WHEN event_type <> 'purchase' THEN
                      CAST(rn AS BIGINT) * 5 + CASE event_type
                        WHEN 'click' THEN 1 WHEN 'error' THEN 2
                        WHEN 'signup' THEN 3 WHEN 'view' THEN 4 END
                    END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS carry
         FROM r)
       SELECT CASE carry % 5 WHEN 1 THEN 'click' WHEN 2 THEN 'error'
                   WHEN 3 THEN 'signup' WHEN 4 THEN 'view' END
                  AS channel,
              CAST(count(*) AS BIGINT) AS n_attributed,
              CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       FROM c WHERE event_type = 'purchase'
       GROUP BY 1""",
    survey="§2.5/§7.5 ext (last-touch attribution)",
    note="each purchase credited to the user's most recent preceding "
         "non-purchase event type "
         "(operators/events.py:last_touch_attribution). The carry is "
         "a running max over rn*K+code — an integer-encoded argmax "
         "both engines express without IGNORE-NULLS windows; "
         "purchases with no prior touch land in channel NULL. One "
         "user_id shuffle, then a 5-row groupBy")
def e6_attribution_last_touch(spark, sf_dir):
    return last_touch_attribution(
        t(spark, sf_dir, "events"), conversion_type="purchase",
        type_codes=_CHANNELS)


@register(
    "ts2_resample_ohlc",
    """WITH b AS (
         SELECT epoch_us(ts) // 900000000 AS bucket_id, value,
                row_number() OVER (
                    PARTITION BY epoch_us(ts) // 900000000
                    ORDER BY ts, event_id) AS rn,
                count(*) OVER (
                    PARTITION BY epoch_us(ts) // 900000000) AS n
         FROM events)
       SELECT CAST(bucket_id AS BIGINT) AS bucket_id,
              max(CASE WHEN rn = 1 THEN value END) AS open,
              max(value) AS high,
              min(value) AS low,
              max(CASE WHEN rn = n THEN value END) AS close,
              CAST(count(*) AS BIGINT) AS n_events,
              round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
                  AS value_sum
       FROM b GROUP BY bucket_id""",
    survey="§2.4/§7.5 ext (time-bucket resample)",
    note="15-minute OHLC downsample of the event value stream "
         "(operators/events.py:resample_ohlc) — the weekly-rollup "
         "shape (A7) at stream granularity. Bucket id is integer "
         "`div` of unix micros (a double quotient can land a half-ulp "
         "under an exact boundary); open/close SELECT raw values at "
         "the (ts,event_id) order endpoints so doubles compare "
         "bit-exactly; the window and groupBy share one bucket-key "
         "exchange")
def ts2_resample_ohlc(spark, sf_dir):
    return resample_ohlc(t(spark, sf_dir, "events"), bucket_minutes=15)


# ------------------------------------------------- curation ops

_TOK_HASH = """((list_reduce(
      list_transform(range(1, length(tk) + 1),
        i -> CAST(ascii(substr(tk, CAST(i AS INTEGER), 1)) AS BIGINT)),
      (a, b) -> (a * 31 + b) % 1000000007) % 4096)
    * 2654435761) % 1001 - 500"""


@register(
    "ext_hashed_linear_score",
    f"""WITH toks AS (
         SELECT doc_id,
                list_filter(
                  regexp_split_to_array(lower(trim(text)), '\\s+'),
                  x -> length(x) > 0) AS tks
         FROM documents)
       SELECT doc_id,
              CAST(len(tks) AS BIGINT) AS n_tokens,
              CAST(CASE WHEN len(tks) = 0 THEN 0 ELSE
                list_sum(list_transform(tks, tk -> {_TOK_HASH}))
              END AS BIGINT) AS score,
              CASE WHEN CAST(CASE WHEN len(tks) = 0 THEN 0 ELSE
                     list_sum(list_transform(tks, tk -> {_TOK_HASH}))
                   END AS BIGINT) >= 0
                   THEN 'keep' ELSE 'drop' END AS verdict
       FROM toks""",
    survey="§7.5 curation ext (hashed linear classifier)",
    note="fasttext-shape hashed bag-of-words scoring "
         "(operators/curation.py:hashed_linear_score): token -> "
         "base-31 Rabin-Karp hash -> 4096-bucket weight -> Σ weights "
         "-> keep/drop. All int64-exact nested transform/aggregate "
         "inside codegen (no UDF); a deterministic weight FORMULA "
         "stands in for trained weights so the op stays "
         "oracle-checkable — deployment swaps in a broadcast weight "
         "map with the same stateless-map plan")
def ext_hashed_linear_score(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return hashed_linear_score(docs, "doc_id", "text")


# target mixture in basis points per source (src0..src19 in the
# testdata) — the knob a data-mixing run turns (down-weight crawl-ish
# sources, keep curated ones whole); the tiered ladder exercises
# full-keep, heavy-keep, and heavy-drop rates. The oracle replays the
# same rates in closed form; the Spark side consumes them as the
# broadcast dim a real run would load.
_MIX_BP = {f"src{i}": 10_000 - (i % 5) * 2_000 for i in range(20)}


@register(
    "ext_source_mixture",
    """WITH kept AS (
         SELECT source, doc_id FROM documents
         WHERE (doc_id * 2654435761) % 10000 <
               10000 - (CAST(substr(source, 4) AS BIGINT) % 5) * 2000)
       SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
              MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
       FROM kept GROUP BY source""",
    survey="§7.5 curation ext (source mixing)",
    note="deterministic source-mixture sampling "
         "(operators/curation.py:mixture_sample): keep each row with "
         "its source's target rate, gated by a multiplicative hash of "
         "doc_id — same verdict per row under any partitioning/retry "
         "(the cap_reviews xxhash lesson), replayable by the oracle. "
         "Rates ride a broadcast join; the corpus pass is "
         "shuffle-free at any scale")
def ext_source_mixture(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("source", "doc_id")
    rates = docs.sparkSession.createDataFrame(
        sorted(_MIX_BP.items()), "source string, rate_bp int")
    kept = mixture_sample(docs, rates, "source", "doc_id")
    return (kept.groupBy("source")
            .agg(F.count("*").alias("n_kept"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id")))
