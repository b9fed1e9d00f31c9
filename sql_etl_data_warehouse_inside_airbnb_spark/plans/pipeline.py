"""The star-schema ETL pipeline, Spark-first.

Re-expresses the reference's clean → stage → MERGE → facts → views flow
(SURVEY §3) as lazy DataFrame lineages. The reference's layers:

  raw csv.gz → cleaned pipe-csv → NVARCHAR staging → typed dims/facts

become:

  raw (all-string DataFrame) → cleaned (pruned + derived cols) →
  typed (try_cast projection + quarantine split) → dims/facts/views

No staging table, no row loops, no client/server round-trips: the
``try_cast`` quarantine IS the reject-file path, the inner joins ARE the
FK enforcement (reference disables constraints during load and relies on
joins — sql/data/04_load_calendar.sql:3,42).

Scale design: dim_listings (~1.5M rows in the published corpus,
BASELINE.md) is broadcast to the calendar/reviews fact joins, so the
62M-row (at 100 TB: billions-row) fact build has NO shuffle on the join
— only the final groupBy(listing_id, week) exchange, which AQE sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.functions.cleaning import (
    TRUTHY_SQL,
    clean_money,
    norm_bool,
    parse_host_location,
    sanitize_numstr,
    truncate_str,
)
from sql_etl_data_warehouse_inside_airbnb_spark.functions.dates import (
    date_dimension,
    tsql_week_end,
    tsql_week_start,
)
from sql_etl_data_warehouse_inside_airbnb_spark.operators.merge import (
    MergeResult,
    merge_upsert,
)

# keep-lists from modules/data_cleaner.py:164-186
LISTINGS_KEEP = ["id", "host_id", "host_name", "host_location",
                 "neighbourhood_cleansed", "latitude", "longitude", "price",
                 "number_of_reviews", "review_scores_rating",
                 "calculated_host_listings_count"]
REVIEWS_KEEP = ["listing_id", "id", "date", "reviewer_id", "reviewer_name",
                "comments"]
CALENDAR_KEEP = ["listing_id", "date", "available", "price"]


def audit_clock(frozen: str | None = None):
    """F11 GETDATE() audit-column clock (sql/data/01_load_listings.sql
    created_date/updated_date defaults). Wall-clock by default; tests
    pass a literal ('2024-06-01 12:00:00') so the audit columns become
    exactly assertable instead of merely non-null."""
    return (F.current_timestamp() if frozen is None
            else F.lit(frozen).cast("timestamp"))


def clean_listings(raw: DataFrame, property_city: str = "Unknown",
                   property_country: str = "Unknown") -> DataFrame:
    """Cleaning stage (modules/data_cleaner.py:67-161): prune to the
    keep-list (P1, warn-and-skip missing), derive (host_city,
    host_country) from host_location (F5/U1), rename
    neighbourhood_cleansed → property_neighbourhood, attach filename
    geography (F6/U2 — passed as literals per-file), drop the parsed
    source columns (P3)."""
    cols = [c for c in LISTINGS_KEEP if c in raw.columns]
    df = raw.select(*cols)
    for c in LISTINGS_KEEP:               # P2: add-with-default
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    city, country = parse_host_location("host_location")
    return (df.withColumn("host_city", city)
              .withColumn("host_country", country)
              .withColumnRenamed("neighbourhood_cleansed", "property_neighbourhood")
              .withColumn("property_city", F.lit(property_city))
              .withColumn("property_country", F.lit(property_country))
              .drop("host_location"))


def type_listings(cleaned: DataFrame) -> DataFrame:
    """Typed projection of the cleaned all-string listings — the TRY_CAST
    stage (modules/data_loader.py:253-269). NVARCHAR truncations are
    applied as semantics (SURVEY §7.3). Rating uses DECIMAL(3,2) per the
    DDL (02_create_tables.sql:18); the loader's (5,2) is a documented
    reference bug (SURVEY §1.2)."""
    return cleaned.select(
        F.col("id").try_cast("bigint").alias("listing_id"),
        sanitize_numstr("host_id").try_cast("bigint").alias("host_id"),
        truncate_str("host_name", 255).alias("host_name"),
        truncate_str("host_city", 255).alias("host_city"),
        truncate_str("host_country", 100).alias("host_country"),
        truncate_str("property_country", 100).alias("property_country"),
        truncate_str("property_city", 255).alias("property_city"),
        truncate_str("property_neighbourhood", 255).alias("property_neighbourhood"),
        F.col("latitude").try_cast("decimal(9,6)").alias("latitude"),
        F.col("longitude").try_cast("decimal(9,6)").alias("longitude"),
        clean_money("price").alias("price"),
        sanitize_numstr("number_of_reviews").try_cast("bigint")
            .alias("number_of_reviews"),
        F.col("review_scores_rating").try_cast("decimal(3,2)")
            .alias("review_scores_rating"),
        sanitize_numstr("calculated_host_listings_count").try_cast("bigint")
            .alias("calculated_host_listings_count"),
        norm_bool("is_local_host", null_as=False).alias("is_local_host")
            if "is_local_host" in cleaned.columns
            else F.lit(False).alias("is_local_host"),
        F.col("id").alias("__raw_id"),
    )


def build_dim_listings(cleaned: DataFrame,
                       existing: DataFrame | None = None,
                       count_actions: bool = True,
                       audit_time: str | None = None
                       ) -> tuple[MergeResult, DataFrame]:
    """Staging → dim_listings MERGE + dim_listing_id_map, one lineage.

    - rows with uncastable ``id`` are EXCLUDED from the dim but PRESERVED
      in the id map with LEFT/SUBSTRING 6-char splits
      (modules/data_loader.py:292-300);
    - MERGE semantics: source wins, pre-deduped (J8, SURVEY §7.3).
    Returns (merge_result_for_dim, id_map).
    """
    typed = type_listings(cleaned)
    id_map = typed.select(
        F.col("listing_id"),
        F.col("__raw_id").alias("listing_raw_id"),
        F.substring("__raw_id", 1, 6).alias("part1"),
        F.substring("__raw_id", 7, 6).alias("part2"),
        F.substring("__raw_id", 13, 6).alias("part3"),
        audit_clock(audit_time).alias("created_date"),
    )
    good = typed.filter(F.col("listing_id").isNotNull()).drop("__raw_id")
    audited = (good.withColumn("created_date", audit_clock(audit_time))
                   .withColumn("updated_date", audit_clock(audit_time)))
    if existing is None:
        existing = audited.limit(0)
    # count_actions=False skips the OUTPUT $action counts, which cost
    # three eager re-executions of the whole clean+type lineage (every
    # gzip file re-scanned) — run_pipeline passes False since it never
    # reads them
    res = merge_upsert(existing, audited, "listing_id",
                       order_by=[F.col("updated_date").desc()],
                       count_actions=count_actions)
    return res, id_map


def build_dim_hosts(dim_listings: DataFrame,
                    audit_time: str | None = None) -> DataFrame:
    """dim_hosts (sql/data/02_load_hosts.sql:7-33): latest listing row
    per host (W1: ROW_NUMBER PARTITION BY host_id ORDER BY updated_date
    DESC, listing_id DESC as deterministic tiebreak) joined to per-host
    listing counts (J7)."""
    w = Window.partitionBy("host_id").orderBy(
        F.col("updated_date").desc(), F.col("listing_id").desc())
    latest = (dim_listings.filter(F.col("host_id").isNotNull())
              .withColumn("__rn", F.row_number().over(w))
              .filter("__rn = 1")
              .select("host_id", "host_name", "host_city", "host_country"))
    counts = (dim_listings.filter(F.col("host_id").isNotNull())
              .groupBy("host_id")
              .agg(F.count("*").cast("int").alias("total_listings")))
    # same shuffle key on both sides — Catalyst reuses the exchange
    return (latest.join(counts, "host_id")
            .withColumn("created_date", audit_clock(audit_time)))


def build_dim_dates(*date_frames: DataFrame) -> DataFrame:
    """Gap-free date dimension spanning min..max of all inputs' ``date``
    column (modules/data_loader.py:484-522), distributed via sequence +
    explode (F10)."""
    dates = None
    for df in date_frames:
        d = df.select(F.try_to_date("date").alias("d")).filter("d IS NOT NULL")
        dates = d if dates is None else dates.unionByName(d)
    return date_dimension(F.col("d"), F.col("d"), dates)


def build_fact_calendar(calendar_raw: DataFrame,
                        dim_listings: DataFrame) -> DataFrame:
    """Weekly rollup (sql/data/04_load_calendar.sql:24-46): inner join to
    dim_listings (J1 — the FK filter), group by (listing_id, T-SQL week
    bucket), AVG(cleaned price) (A6), SUM(available∈truthy) (A5).

    Join strategy: dim side projected to the key only and broadcast —
    the daily-grain fact (62M rows in the published corpus) never
    shuffles for the join; the only exchange is the rollup groupBy.
    """
    cal = calendar_raw.select(
        F.col("listing_id").try_cast("bigint").alias("listing_id"),
        F.try_to_date("date").alias("cal_date"),
        F.col("available"),
        clean_money("price").alias("clean_price"),
    ).filter(F.col("listing_id").isNotNull() & F.col("cal_date").isNotNull())
    keys = F.broadcast(dim_listings.select("listing_id").distinct())
    joined = cal.join(keys, "listing_id", "inner")
    avail = F.lower(F.trim(F.col("available"))).isin(*TRUTHY_SQL)
    return (joined
            .groupBy("listing_id",
                     tsql_week_start("cal_date").alias("week_start_date"))
            .agg(F.max(tsql_week_end("cal_date")).alias("week_end_date"),
                 F.avg("clean_price").cast("decimal(10,2)")
                  .alias("avg_price_per_week"),
                 F.sum(F.when(avail, 1).otherwise(0)).cast("int")
                  .alias("available_days_per_week")))


def cap_reviews(reviews_raw: DataFrame, max_rows: int = 200_000,
                frac: float = 0.8, seed: int = 42,
                exact: bool = False, key_col: str = "id") -> DataFrame:
    """Reproduction of the reference's reviews sampling cap
    (modules/data_loader.py:427-431): a reviews FILE larger than
    ``max_rows`` is down-sampled to 80% with a fixed seed before
    loading. OFF by default (``run_pipeline(reviews_cap=False)``) — it
    silently drops a fifth of the data, which is a documented semantic
    of the reference's loads, not something a warehouse should default
    to (SURVEY §7.3 divergence note). The cap decision needs the row
    count, so enabling it costs one extra pass over the raw file.

    ``exact=False`` (default): seeded Bernoulli ``sample(frac)`` —
    per-partition, no shuffle, row count approximate. The scale path.
    ``exact=True``: matches the reference's exact ``n = int(0.8 *
    rows)`` count AND is row-level reproducible: ranks by a seeded
    ``xxhash64`` of ``key_col`` (tie-broken by the key itself, the
    ext_train_split pattern) rather than ``rand(seed)``, whose draw
    order depends on the input partition layout — the SELECTED subset,
    not just its size, is therefore stable across repartitionings.
    Still a global sort: fine at the reference's single-node scale,
    NOT the 100 TB path."""
    n = reviews_raw.count()
    if n <= max_rows:
        return reviews_raw
    if not exact:
        return reviews_raw.sample(fraction=frac, seed=seed)
    w = Window.orderBy(F.xxhash64(F.col(key_col), F.lit(seed)),
                       F.col(key_col))
    return (reviews_raw.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= int(n * frac)).drop("__rk"))


def build_fact_reviews(reviews_raw: DataFrame, dim_listings: DataFrame,
                       dim_dates: DataFrame,
                       existing: DataFrame | None = None) -> DataFrame:
    """fact_reviews load (sql/data/05_load_reviews.sql:30-56):
    W2 dedup of duplicate review ids within the batch (deterministic
    winner: lowest listing_id/reviewer_id), J2 join to dim_dates on
    try_to_date(date), J3 join to dim_listings on cast key, J4 left-anti
    vs already-loaded review_ids (idempotent append), NVARCHAR
    truncations (reviewer_name 255, comments 4000)."""
    w = Window.partitionBy("review_id").orderBy("listing_id", "reviewer_id")
    src = (reviews_raw.select(
               F.col("id").try_cast("bigint").alias("review_id"),
               F.col("listing_id").try_cast("bigint").alias("listing_id"),
               F.try_to_date("date").alias("review_date"),
               F.col("reviewer_id").try_cast("bigint").alias("reviewer_id"),
               truncate_str("reviewer_name", 255).alias("reviewer_name"),
               truncate_str("comments", 4000).alias("comments"))
           .filter(F.col("review_id").isNotNull())
           .withColumn("__rn", F.row_number().over(w))
           .filter("__rn = 1").drop("__rn"))
    dated = src.join(F.broadcast(dim_dates.select("date_id", "full_date")),
                     src.review_date == F.col("full_date"), "inner")
    listed = dated.join(
        F.broadcast(dim_listings.select("listing_id").distinct()),
        "listing_id", "inner")
    # review_date rides along so the persisted fact can partition by
    # month (date-range pruning at scale); date_id stays the FK
    out = listed.select("review_id", "listing_id", "date_id", "reviewer_id",
                        "reviewer_name", "comments", "review_date")
    if existing is not None:
        out = out.join(existing.select("review_id"), "review_id", "left_anti")
    return out


def register_views(spark, dim_listings: DataFrame) -> None:
    """The three analytical views (sql/schema/03_create_views.sql:14-57),
    registered as temp views so ``spark.sql`` serves them."""
    dim_listings.createOrReplaceTempView("dim_listings")
    spark.sql("""
        CREATE OR REPLACE TEMP VIEW vw_local_foreign_analysis AS
        SELECT property_country, property_city, latitude, longitude,
               is_local_host,
               COUNT(*) AS listing_count,
               AVG(price) AS avg_price,
               AVG(review_scores_rating) AS avg_rating,
               SUM(number_of_reviews) AS total_reviews
        FROM dim_listings
        GROUP BY property_country, property_city, latitude, longitude,
                 is_local_host
    """)
    spark.sql("""
        CREATE OR REPLACE TEMP VIEW vw_neighborhood_performance AS
        SELECT property_country, property_city, property_neighbourhood,
               COUNT(*) AS listing_count,
               AVG(price) AS avg_price,
               AVG(review_scores_rating) AS avg_rating,
               AVG(number_of_reviews) AS avg_reviews
        FROM dim_listings
        GROUP BY property_country, property_city, property_neighbourhood
    """)
    spark.sql("""
        CREATE OR REPLACE TEMP VIEW vw_host_activity AS
        SELECT host_country, host_city, latitude, longitude,
               COUNT(DISTINCT host_id) AS unique_hosts,
               COUNT(*) AS listing_count,
               AVG(price) AS avg_price
        FROM dim_listings
        GROUP BY host_country, host_city, latitude, longitude
    """)
