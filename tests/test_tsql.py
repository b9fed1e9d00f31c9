"""T-SQL dialect shim: translation goldens plus semantic equivalence
of the translated SQL against the engine's own column helpers and
against hand-computed T-SQL behavior."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.functions.dates import (
    tsql_week_start,
)
from sql_etl_data_warehouse_inside_airbnb_spark.functions.tsql import (
    run_tsql,
    tsql_to_spark_sql,
)


def test_simple_rewrites():
    assert tsql_to_spark_sql("SELECT GETDATE()") \
        == "SELECT current_timestamp()"
    assert tsql_to_spark_sql("SELECT ISNULL(a, 0) FROM t") \
        == "SELECT coalesce(a, 0) FROM t"
    assert tsql_to_spark_sql("SELECT LEN(name) FROM t") \
        == "SELECT length(rtrim(name)) FROM t"
    assert tsql_to_spark_sql("SELECT [order key] FROM [my table]") \
        == "SELECT `order key` FROM `my table`"
    assert tsql_to_spark_sql("SELECT CHARINDEX('x', s) FROM t") \
        == "SELECT locate('x', s) FROM t"
    assert tsql_to_spark_sql("SELECT IIF(a > 1, 'y', 'n') FROM t") \
        == "SELECT if(a > 1, 'y', 'n') FROM t"


def test_top_to_limit():
    # LIMIT lands on its own line so a trailing -- comment can't eat it
    assert tsql_to_spark_sql("SELECT TOP 20 a FROM t ORDER BY a") \
        == "SELECT a FROM t ORDER BY a\nLIMIT 20"
    assert tsql_to_spark_sql("SELECT DISTINCT TOP (5) a FROM t;") \
        == "SELECT DISTINCT a FROM t\nLIMIT 5"
    with pytest.raises(ValueError):
        tsql_to_spark_sql(
            "SELECT a FROM (SELECT TOP 5 a FROM t) q")


def test_convert_styles():
    assert tsql_to_spark_sql("SELECT CONVERT(DATE, d) FROM t") \
        == "SELECT CAST(d AS DATE) FROM t"
    assert tsql_to_spark_sql("SELECT CONVERT(VARCHAR(10), d, 23) FROM t") \
        == "SELECT date_format(d, 'yyyy-MM-dd') FROM t"
    assert tsql_to_spark_sql("SELECT CONVERT(VARCHAR, d, 112) FROM t") \
        == "SELECT date_format(d, 'yyyyMMdd') FROM t"
    assert tsql_to_spark_sql("SELECT TRY_CONVERT(DATETIME, s) FROM t") \
        == "SELECT try_cast(s AS TIMESTAMP) FROM t"


def test_week_trunc_idiom_matches_engine_helper(spark):
    """The reference's DATEADD(wk, DATEDIFF(wk, 0, d), 0) through the
    shim must equal functions/dates.py:tsql_week_start on every day of
    a two-year span (covers the Sunday -> next-Monday trap)."""
    days = [(dt.date(2023, 1, 1) + dt.timedelta(days=i),)
            for i in range(730)]
    df = spark.createDataFrame(days, ["d"])
    df.createOrReplaceTempView("tsql_days")
    translated = run_tsql(
        spark,
        "SELECT d, DATEADD(wk, DATEDIFF(wk, 0, d), 0) AS ws "
        "FROM tsql_days")
    expected = df.select("d", tsql_week_start("d").alias("ws"))
    diff = translated.exceptAll(expected)
    assert diff.count() == 0
    # spot-pin the trap: Sunday 2023-01-08 -> Monday 2023-01-09
    row = {r["d"]: r["ws"] for r in translated.collect()}
    assert row[dt.date(2023, 1, 8)] == dt.date(2023, 1, 9)
    assert row[dt.date(2023, 1, 9)] == dt.date(2023, 1, 9)


def test_datediff_boundary_semantics(spark):
    """T-SQL DATEDIFF counts boundary crossings: Sat->Sun is 1 week
    apart, Sun->Mon is 0; month/year compare calendar positions."""
    out = run_tsql(spark, """
        SELECT DATEDIFF(wk, DATE'2024-03-09', DATE'2024-03-10') AS sat_sun,
               DATEDIFF(wk, DATE'2024-03-10', DATE'2024-03-11') AS sun_mon,
               DATEDIFF(mm, DATE'2024-01-31', DATE'2024-02-01') AS mm_cross,
               DATEDIFF(yy, DATE'2023-12-31', DATE'2024-01-01') AS yy_cross,
               DATEDIFF(dd, DATE'2024-03-01', DATE'2024-03-10') AS dd_plain
        """).collect()[0]
    assert out["sat_sun"] == 1      # crossed the Sunday boundary
    assert out["sun_mon"] == 0      # no boundary between Sun and Mon
    assert out["mm_cross"] == 1
    assert out["yy_cross"] == 1
    assert out["dd_plain"] == 9


def test_dateadd_parts(spark):
    out = run_tsql(spark, """
        SELECT DATEADD(dd, 5, DATE'2024-02-27') AS d5,
               DATEADD(mm, 1, DATE'2024-01-31') AS m1,
               DATEADD(yy, -1, DATE'2024-02-29') AS y_1,
               DATEADD(wk, 2, 0) AS epoch_2wk
        """).collect()[0]
    assert out["d5"] == dt.date(2024, 3, 3)
    assert out["m1"] == dt.date(2024, 2, 29)   # clamped like T-SQL
    assert out["y_1"] == dt.date(2023, 2, 28)
    assert out["epoch_2wk"] == dt.date(1900, 1, 15)


def test_len_ignores_trailing_spaces(spark):
    out = run_tsql(spark, "SELECT LEN('ab  ') AS n, LEN('  ab') AS m") \
        .collect()[0]
    assert out["n"] == 2 and out["m"] == 4


def test_reference_shaped_weekly_rollup(spark, sf_dir):
    """A reference-style T-SQL weekly rollup (04_load_calendar.sql's
    idiom + TOP) runs end-to-end through the shim and matches the
    native-Spark formulation of the same query."""
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        read_table,
    )
    li = read_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_tsql")
    got = run_tsql(spark, """
        SELECT TOP 10 l_suppkey,
               DATEADD(wk, DATEDIFF(wk, 0, CONVERT(DATE, l_shipdate)), 0)
                   AS week_start,
               COUNT(*) AS n
        FROM lineitem_tsql
        GROUP BY l_suppkey,
                 DATEADD(wk, DATEDIFF(wk, 0, CONVERT(DATE, l_shipdate)), 0)
        ORDER BY n DESC, l_suppkey, week_start
    """).collect()
    want = (li.groupBy("l_suppkey",
                       tsql_week_start("l_shipdate").alias("week_start"))
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "l_suppkey", "week_start")
            .limit(10).collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_string_literals_are_data():
    # rewrites must never touch literal CONTENT (the code-review repro)
    assert tsql_to_spark_sql("SELECT 'LEN(x)' AS s FROM t") \
        == "SELECT 'LEN(x)' AS s FROM t"
    assert tsql_to_spark_sql("SELECT a FROM t WHERE n = 'use GETDATE() now'") \
        == "SELECT a FROM t WHERE n = 'use GETDATE() now'"
    # unbalanced parens INSIDE a literal must not break the scanner
    assert tsql_to_spark_sql("SELECT 'DATEADD(' AS s FROM t") \
        == "SELECT 'DATEADD(' AS s FROM t"
    out = tsql_to_spark_sql("SELECT ISNULL(a, 'ISNULL(') FROM t")
    assert out == "SELECT coalesce(a, 'ISNULL(') FROM t"
    # doubled-quote escape stays one literal
    assert tsql_to_spark_sql("SELECT 'it''s LEN(x)' FROM t") \
        == "SELECT 'it''s LEN(x)' FROM t"
    # brackets inside literals are data too
    assert tsql_to_spark_sql("SELECT '[not an ident]' FROM [t]") \
        == "SELECT '[not an ident]' FROM `t`"


def test_top_variants_raise_or_survive_comments():
    with pytest.raises(ValueError, match="PERCENT"):
        tsql_to_spark_sql("SELECT TOP 10 PERCENT a FROM t")
    with pytest.raises(ValueError, match="PERCENT|TIES"):
        tsql_to_spark_sql("SELECT TOP 5 WITH TIES a FROM t ORDER BY a")
    # a trailing line comment must not swallow the appended LIMIT
    out = tsql_to_spark_sql("SELECT TOP 5 a FROM t ORDER BY a -- note")
    assert out.endswith("\nLIMIT 5")


def test_spark_two_arg_datediff_passes_through():
    assert tsql_to_spark_sql("SELECT DATEDIFF(d2, d1) FROM t") \
        == "SELECT datediff(d2, d1) FROM t"


def test_comment_limit_executes(spark):
    df = spark.range(10).toDF("a")
    df.createOrReplaceTempView("t_cl")
    got = run_tsql(spark,
                   "SELECT TOP 3 a FROM t_cl ORDER BY a -- top three")
    assert got.count() == 3


def test_convert_declared_length_truncates(spark):
    # T-SQL truncates the formatted string to the DECLARED length:
    # CONVERT(VARCHAR(10), d, 120) is the date-only idiom (ADVICE r3)
    out = tsql_to_spark_sql("SELECT CONVERT(VARCHAR(10), d, 120) FROM t")
    assert "substring(date_format(d, 'yyyy-MM-dd HH:mm:ss'), 1, 10)" in out
    # length >= the style's width: no truncation wrapper
    assert "substring" not in tsql_to_spark_sql(
        "SELECT CONVERT(VARCHAR(30), d, 120) FROM t")
    assert "substring" not in tsql_to_spark_sql(
        "SELECT CONVERT(VARCHAR(10), d, 23) FROM t")
    # undeclared length (T-SQL default 30) and MAX: no truncation
    assert "substring" not in tsql_to_spark_sql(
        "SELECT CONVERT(VARCHAR, d, 120) FROM t")
    assert "substring" not in tsql_to_spark_sql(
        "SELECT CONVERT(VARCHAR(MAX), d, 120) FROM t")
    # end-to-end: the truncated idiom yields the 10-char date
    df = spark.sql("SELECT TIMESTAMP '2025-06-01 13:45:09' AS d")
    df.createOrReplaceTempView("t_cv")
    got = run_tsql(
        spark, "SELECT CONVERT(VARCHAR(10), d, 120) AS s FROM t_cv")
    assert got.first()["s"] == "2025-06-01"


def test_comments_are_not_code():
    # function names inside comments are neither rewritten nor allowed
    # to break the balanced-paren scanner (ADVICE r3)
    out = tsql_to_spark_sql("SELECT ISNULL(a, b) FROM t -- ISNULL(")
    assert out == "SELECT coalesce(a, b) FROM t -- ISNULL("
    out = tsql_to_spark_sql("SELECT a /* GETDATE() */ FROM t")
    assert out == "SELECT a /* GETDATE() */ FROM t"
    # balanced calls inside comments stay untouched too
    out = tsql_to_spark_sql("SELECT a FROM t -- LEN(x) trailing")
    assert out == "SELECT a FROM t -- LEN(x) trailing"
    # nested block comments (T-SQL nests /* /* */ */)
    out = tsql_to_spark_sql("SELECT a /* outer /* LEN( */ still */ FROM t")
    assert out == "SELECT a /* outer /* LEN( */ still */ FROM t"
    # a comment between a name and its args must not confuse parens
    out = tsql_to_spark_sql(
        "SELECT ISNULL(a, -- why not b\n b) FROM t")
    assert out.startswith("SELECT coalesce(")
    # '--' inside a string literal is DATA, not a comment
    out = tsql_to_spark_sql("SELECT ISNULL(a, '--') FROM t")
    assert out == "SELECT coalesce(a, '--') FROM t"


def test_datediff_week_pre_epoch(spark):
    # div truncates toward zero; FLOOR division counts the Sunday
    # crossing for pre-1900 dates too (ADVICE r3):
    # 1899-12-30 is a Saturday, 1900-01-01 a Monday -> one crossing
    got = run_tsql(
        spark,
        "SELECT DATEDIFF(wk, '1899-12-30', '1900-01-01') AS w").first()
    assert got["w"] == 1
    # and a whole pre-epoch week apart
    got = run_tsql(
        spark,
        "SELECT DATEDIFF(wk, '1899-12-20', '1899-12-28') AS w").first()
    assert got["w"] == 1
    # post-epoch semantics unchanged (Sat -> Sun crosses, Mon -> Sat not)
    got = run_tsql(
        spark,
        "SELECT DATEDIFF(wk, '2025-06-07', '2025-06-08') AS a,"
        "       DATEDIFF(wk, '2025-06-02', '2025-06-07') AS b").first()
    assert (got["a"], got["b"]) == (1, 0)


def test_comment_comma_does_not_split_args():
    out = tsql_to_spark_sql("SELECT ISNULL(a, -- f(x, y)\n b) FROM t")
    assert out == "SELECT coalesce(a, -- f(x, y)\n b) FROM t"


def test_apostrophe_inside_double_quoted_string():
    # an apostrophe inside a double-quoted string/identifier must not
    # open a phantom literal span (code-review regression)
    out = tsql_to_spark_sql("SELECT DATEDIFF(dd, \"col's\", d2) FROM t")
    assert out == 'SELECT datediff(d2, "col\'s") FROM t'
    from sql_etl_data_warehouse_inside_airbnb_spark.functions.tsql import (
        _split_args,
    )
    assert _split_args("\"it's\", x") == ['"it\'s"', "x"]
    # and '--' inside a double-quoted string is not a comment
    out = tsql_to_spark_sql('SELECT ISNULL(a, "x--y") FROM t')
    assert out == 'SELECT coalesce(a, "x--y") FROM t'
