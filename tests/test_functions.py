"""Unit tests for the scalar-function surface (SURVEY §7.3 hard parts)."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.functions.cleaning import (
    TRUTHY_SQL,
    clean_money,
    norm_bool,
    parse_host_location,
    sanitize_numstr,
)
from sql_etl_data_warehouse_inside_airbnb_spark.functions.dates import (
    tsql_week_end,
    tsql_week_start,
)
from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
    lang_id,
    lang_id_udf,
    token_count,
)


def _one_col(spark, values, fn):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    return [r.y for r in df.select(fn("x").alias("y")).collect()]


def test_clean_money(spark):
    got = _one_col(spark, ["$1,234.00", "$85.00\r", " 99.5 ", "", "junk",
                           None, "1,000,000.99"], clean_money)
    assert got == [Decimal("1234.00"), Decimal("85.00"), Decimal("99.50"),
                   None, None, None, Decimal("1000000.99")]


def test_sanitize_numstr(spark):
    got = _one_col(spark, ["123.0", " 42 ", "7.000", "", "x.0"],
                   sanitize_numstr)
    assert got == ["123", "42", "7", None, "x"]


def test_norm_bool_ladders(spark):
    vals = ["t", "TRUE", "1", "y", "yes", "f", "no", "junk", " t ", None]
    loader = _one_col(spark, vals, lambda c: norm_bool(c))
    assert loader == [True, True, True, True, True,
                      False, False, False, True, False]
    sql_set = _one_col(spark, vals,
                       lambda c: norm_bool(c, TRUTHY_SQL, null_as=None))
    assert sql_set == [True, True, True, False, False,
                       False, False, False, True, None]


def test_parse_host_location_shapes(spark):
    df = spark.createDataFrame(
        [("Paris, France",), ("Lyon, Rhone, France",), ("France",),
         ("",), (None,), ("  Madrid ,  Spain ",)], ["x"])
    city, country = parse_host_location("x")
    got = [(r.host_city, r.host_country)
           for r in df.select(city, country).collect()]
    assert got == [("Paris", "France"), ("Lyon, Rhone", "France"),
                   ("Unknown", "France"), ("Unknown", "Unknown"),
                   ("Unknown", "Unknown"), ("Madrid", "Spain")]


def test_week_bucketing_all_days(spark):
    """T-SQL DATEADD/DATEDIFF week semantics across a full Sun..Sat
    sweep + year boundary: Sunday belongs to the NEXT Monday's week."""
    days = [datetime.date(2025, 6, d) for d in range(8, 15)]  # Sun..Sat
    days += [datetime.date(2024, 12, 29),   # Sunday before new year
             datetime.date(2024, 12, 30),   # Monday
             datetime.date(2025, 1, 1)]
    df = spark.createDataFrame([(d,) for d in days], ["x"])
    rows = df.select(
        "x", tsql_week_start("x").alias("ws"), tsql_week_end("x").alias("we")
    ).collect()
    for r in rows:
        assert r.ws.weekday() == 0                    # always a Monday
        assert (r.we - r.ws).days == 6
        if r.x.weekday() == 6:                        # Sunday
            assert r.ws == r.x + datetime.timedelta(days=1)
        else:
            assert r.ws <= r.x <= r.we
    by_day = {r.x: r.ws for r in rows}
    assert by_day[datetime.date(2025, 6, 8)] == datetime.date(2025, 6, 9)
    assert by_day[datetime.date(2024, 12, 29)] == datetime.date(2024, 12, 30)


def test_lang_id_expr_and_udf_agree(spark):
    texts = ["the cat sat on a mat",
             "la casa y el perro",
             "der hund und der baum",
             "le chat et les oiseaux",
             "xyzzy plugh",
             "",
             None]
    df = spark.createDataFrame([(s,) for s in texts], ["x"])
    expr_out = [r.y for r in df.select(lang_id("x").alias("y")).collect()]
    udf_out = [r.y for r in df.select(lang_id_udf("x").alias("y")).collect()]
    assert expr_out[:5] == ["en", "es", "de", "fr", "und"]
    # NULL text: expr propagates NULL, udf maps to 'und' before hitting
    # Spark — both acceptable downstream, equality enforced on non-null
    assert expr_out[:6] == udf_out[:6]


def test_token_count_edges(spark):
    got = _one_col(spark, ["a b  c", "  ", "", "one", None], token_count)
    assert got == [3, 0, 0, 1, None]


def test_host_location_udf_matches_column_expr(spark):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.cleaning import (
        parse_host_location,
        parse_host_location_udf,
    )
    rows = [("Paris, France",), ("Austin, Texas, United States",),
            ("TX",), ("",), ("  ",), (None,), (" a , b ",)]
    df = spark.createDataFrame(rows, ["loc"])
    city, country = parse_host_location("loc")
    expr_out = [(r.host_city, r.host_country)
                for r in df.select(city, country).collect()]
    u = parse_host_location_udf("loc")
    udf_out = [(r.city, r.country) for r in
               df.select(u.getField("city").alias("city"),
                         u.getField("country").alias("country")).collect()]
    assert udf_out == expr_out


def test_week_bucket_invariants_full_sweep(spark):
    """Exhaustive 8-year sweep of the T-SQL week bucketing: week_start
    is always a Monday ON or AFTER (Sun) / BEFORE-or-on (Mon..Sat) the
    date such that Sun..Sat map to the Monday following that Sunday;
    span is always 6 days; bucketing is idempotent."""
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.dates import (
        tsql_week_end,
        tsql_week_start,
    )
    days = spark.sql(
        "SELECT explode(sequence(DATE'1997-01-01', DATE'2004-12-31')) AS d")
    checked = days.select(
        "d",
        tsql_week_start("d").alias("ws"),
        tsql_week_end("d").alias("we"),
        F.dayofweek("d").alias("dow"))  # 1=Sun .. 7=Sat
    bad = checked.filter(
        # week_start must be a Monday
        (F.dayofweek("ws") != 2)
        # span is exactly 6 days
        | (F.datediff("we", "ws") != 6)
        # Sunday -> NEXT Monday (ws = d+1); Mon..Sat -> ws <= d, d-ws <= 5
        | ((F.col("dow") == 1) & (F.datediff("ws", "d") != 1))
        | ((F.col("dow") != 1) & ((F.datediff("d", "ws") < 0)
                                  | (F.datediff("d", "ws") > 5)))
        # idempotent: bucketing the bucket start is a no-op
        | (tsql_week_start("ws") != F.col("ws")))
    assert bad.count() == 0


def test_udtf_tokenize_equals_explode_path(spark, sf_dir):
    # the Python UDTF must emit exactly what the JVM posexplode path
    # emits — same tokens, same 1-based positions
    from pyspark.sql import functions as F

    from sql_etl_data_warehouse_inside_airbnb_spark.functions.tabular import (
        register_udtfs,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        read_table,
    )

    register_udtfs(spark)
    docs = read_table(spark, sf_dir, "documents").limit(200)
    docs.createOrReplaceTempView("udtf_eq_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, tk.token, tk.pos "
        "FROM udtf_eq_docs d, LATERAL tokenize(d.text) tk")
    tokens = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    via_explode = (docs
                   .select("doc_id", F.posexplode(tokens)
                           .alias("pos0", "token"))
                   .select("doc_id", "token",
                           (F.col("pos0") + 1).cast("bigint").alias("pos")))
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, via_explode.collect()))
    assert a == b and len(a) > 0


def test_rolling_hash_known_fold(spark):
    # reference fold in plain python: ((acc*31 + codepoint) % (1e9+7))
    def py_rh(s, prefix=64):
        acc = 0
        for ch in s[:prefix]:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        return acc

    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        rolling_hash,
    )
    vals = ["hello world", "h", "", "a" * 200, "Árvíztűrő tükörfúrógép"]
    got = _one_col(spark, vals, rolling_hash)
    assert got == [py_rh(v) for v in vals]


def test_winnow_shared_run_guarantee(spark):
    # winnowing guarantee: any shared substring of length >= w+k-1
    # (here 4+5-1=8) yields at least one shared fingerprint
    from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (
        winnow_fingerprints,
    )
    shared = "the quick brown fox jumps"
    df = spark.createDataFrame(
        [(1, "AAAA " + shared), (2, shared + " ZZZZ"),
         (3, "completely unrelated text with no overlap at all")],
        ["doc_id", "text"])
    fps = winnow_fingerprints(df, "doc_id", "text", k=5, window=4)
    sets = {k: {r.fp for r in g} for k, g in
            ((k, [r for r in fps.collect() if r.doc_id == k])
             for k in (1, 2, 3))}
    assert sets[1] & sets[2], "docs sharing a 25-char run must share a fp"
    assert not (sets[1] & sets[3])


def test_native_stats_functions_match_oracle(spark, sf_dir):
    # the native estimators divide, so they're pinned here with
    # tolerance instead of value-hashed in the a27 oracle row:
    # stddev_samp/var_samp/corr/covar_samp use the SAME definition on
    # both engines (agree to ~1e-12 rel); skewness/kurtosis use
    # DIFFERENT estimators (Spark: population moments m3/m2^1.5 and
    # m4/m2^2-3; DuckDB: bias-corrected sample g1/G2) so Spark is
    # checked against the population formula computed from exact sums
    import duckdb
    import math

    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        read_table,
    )
    from pyspark.sql import functions as F

    li = read_table(spark, sf_dir, "lineitem")
    got = li.agg(
        F.stddev_samp("l_quantity").alias("sd"),
        F.var_samp("l_quantity").alias("vr"),
        F.corr("l_quantity", "l_extendedprice").alias("co"),
        F.covar_samp("l_quantity", "l_extendedprice").alias("cv"),
        F.skewness("l_quantity").alias("sk"),
        F.kurtosis("l_quantity").alias("ku"),
    ).first()

    con = duckdb.connect()
    exp = con.execute(
        f"""SELECT stddev_samp(l_quantity), var_samp(l_quantity),
                   corr(l_quantity, l_extendedprice),
                   covar_samp(l_quantity, l_extendedprice)
            FROM '{sf_dir}/lineitem.parquet'""").fetchone()
    for got_v, exp_v, name in [(got.sd, exp[0], "stddev"),
                               (got.vr, exp[1], "var"),
                               (got.co, exp[2], "corr"),
                               (got.cv, exp[3], "covar")]:
        assert math.isclose(got_v, exp_v, rel_tol=1e-9), (name, got_v, exp_v)

    # population skewness/kurtosis from exact moments (Spark's defs)
    n, s1, s2, s3, s4 = con.execute(
        f"""SELECT count(*),
                   sum(l_quantity), sum(l_quantity**2),
                   sum(l_quantity**3), sum(l_quantity**4)
            FROM '{sf_dir}/lineitem.parquet'""").fetchone()
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * s2 / n + 2 * mu ** 3
    m4 = s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n - 3 * mu ** 4
    assert math.isclose(got.sk, m3 / m2 ** 1.5, rel_tol=1e-7)
    assert math.isclose(got.ku, m4 / m2 ** 2 - 3, rel_tol=1e-7)


def test_hll_sketch_union_accuracy(spark, sf_dir):
    # a33's contract (r12 tolerance-anchored form): the exact side
    # must EQUAL an independent DuckDB count-distinct per type and
    # globally, and within_tol — computed Spark-side from the real
    # per-type / union-merged HLL estimates — must hold on every row
    # (default lgConfigK=12 -> rsd ~1.6%; the contract allows
    # max(5% rel, 2 abs)).
    import duckdb

    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )

    got = {r.event_type: r
           for r in REGISTRY["a33_hll_sketch_union"].build(spark, sf_dir).collect()}

    con = duckdb.connect()
    exact = dict(con.execute(
        f"""SELECT event_type, COUNT(DISTINCT user_id)
            FROM '{sf_dir}/events.parquet' GROUP BY event_type""").fetchall())
    exact["__ALL__"] = con.execute(
        f"SELECT COUNT(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]

    assert set(got) == set(exact)
    for k, r in got.items():
        assert r.exact_users == exact[k], (k, r.exact_users, exact[k])
        assert r.within_tol == 1, (k, r)


def test_chunk_documents_reassembly(spark):
    # chunks must tile the document: step-strided starts, dense ids,
    # first chunk == first chunk_size tokens, last chunk reaches the end
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        chunk_documents,
    )
    text = " ".join(f"t{i}" for i in range(150))
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, ""), (4, None)],
                               ["doc_id", "text"])
    out = chunk_documents(df, chunk_size=64, overlap=16)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # 150 tokens, step 48 -> ceil((150-16)/48) = 3 chunks
    assert sorted(cid for d, cid in rows if d == 1) == [0, 1, 2]
    assert rows[(1, 0)].chunk_text.split()[0] == "t0"
    assert rows[(1, 1)].chunk_text.split()[0] == "t48"
    assert rows[(1, 2)].chunk_text.split()[-1] == "t149"
    assert rows[(1, 0)].n_chunk_tokens == 64
    # short, empty, and NULL docs still produce exactly one chunk
    assert rows[(2, 0)].chunk_text == "a b"
    assert rows[(3, 0)].n_chunk_tokens == 0
    assert rows[(4, 0)].n_chunk_tokens == 0
    assert rows[(4, 0)].chunk_text == ""


def test_redact_pii_and_repetition(spark):
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        distinct_token_bp,
        redact_pii,
    )
    df = spark.createDataFrame(
        [(1, "mail me at bob.smith+x@ex-ample.co.uk or +44 7700 900123 now"),
         (2, "spam spam spam spam"),
         (3, "all tokens unique here")],
        ["doc_id", "text"])
    out = {r.doc_id: r for r in df.select(
        "doc_id", redact_pii("text").alias("red"),
        distinct_token_bp("text").alias("bp")).collect()}
    assert "<EMAIL>" in out[1].red and "<PHONE>" in out[1].red
    assert "bob" not in out[1].red and "900123" not in out[1].red
    assert out[2].bp == 2500       # 1 distinct of 4
    assert out[3].bp == 10000


def test_sql_functions_mirror_column_builders(spark):
    """The SQL-UDF surface (functions/sqlfns.py) must agree with the
    Column builders on the messy alphabet — same nulls, same decimals,
    same week Sundays — so the two surfaces cannot drift."""
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.cleaning import (
        TRUTHY_LOADER,
        TRUTHY_SQL,
        clean_money,
        norm_bool,
        sanitize_numstr,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.dates import (
        tsql_week_end,
        tsql_week_start,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.sqlfns import (
        register_sql_functions,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.text import (
        fingerprint,
        token_count,
    )

    names = register_sql_functions(spark)
    assert "clean_money" in names

    messy = ["$1,234.00\r", " $5.50 ", "", "junk", None, "12.0", " 7 ",
             "t", "TRUE ", "yes", "n", "0", "  a  b\tc ", "x\ny"]
    df = spark.createDataFrame([(s,) for s in messy], "s string")
    df.createOrReplaceTempView("messy_fixture")

    col_side = df.select(
        clean_money("s").alias("m"),
        sanitize_numstr("s").alias("n"),
        norm_bool("s", TRUTHY_LOADER).alias("bl"),
        norm_bool("s", TRUTHY_SQL).alias("bs"),
        token_count("s").alias("tc"),
        fingerprint("s").alias("fp")).collect()
    sql_side = spark.sql(
        "SELECT clean_money(s) AS m, sanitize_numstr(s) AS n, "
        "norm_bool_loader(s) AS bl, norm_bool_sql(s) AS bs, "
        "token_count(s) AS tc, doc_fingerprint(s) AS fp "
        "FROM messy_fixture").collect()
    assert [tuple(r) for r in col_side] == [tuple(r) for r in sql_side]

    # week functions over a Sunday-spanning range (the #1 trap)
    dates = spark.sql(
        "SELECT sequence(DATE '2025-05-26', DATE '2025-06-10') AS ds") \
        .selectExpr("explode(ds) AS d")
    dates.createOrReplaceTempView("dates_fixture")
    cs = dates.select(tsql_week_start("d").alias("ws"),
                      tsql_week_end("d").alias("we")).collect()
    ss = spark.sql("SELECT tsql_week_start(d) AS ws, tsql_week_end(d) AS we "
                   "FROM dates_fixture").collect()
    assert [tuple(r) for r in cs] == [tuple(r) for r in ss]
