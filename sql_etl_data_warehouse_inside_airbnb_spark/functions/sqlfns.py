"""SQL-callable scalar surface: the engine's cleaning/date/text
helpers as Spark SQL UDFs, so ``--sql`` users (and any
``spark.sql``-only consumer of the migrated warehouse) can call them
by name the way the reference's T-SQL calls its inline expressions.

These are Spark 4 SQL FUNCTIONS (``CREATE TEMPORARY FUNCTION ...
RETURN <expr>``) — the body is a SQL expression Catalyst INLINES into
the calling plan, so they cost exactly what the Column-builder twins
in ``cleaning.py``/``dates.py``/``text.py`` cost: whole-stage
codegen, no Python boundary, filters still push down through them.
Each body mirrors its Column twin; ``tests/test_functions.py``
asserts the pair agrees on the messy-fixture alphabet so the two
surfaces cannot drift.

Reference parity: the reference exposes this surface as raw T-SQL
idioms repeated inline (REPLACE ladders in 04_load_calendar.sql:30-36,
the week-truncation expression, LEFT/SUBSTRING splits) — naming them
is the migration affordance its users asked of a view layer.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, return type, body). Bodies are Spark SQL and
# must mirror the Column builders exactly (tested, not assumed).
_SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # cleaning.clean_money. NOTE on every regex below: Spark SQL
    # string literals consume single backslashes ('\s' parses to
    # 's'), so regex escapes are DOUBLED to survive the SQL parser —
    # the classic silent-pattern-corruption trap, caught by the
    # twin-equality test.
    "clean_money": (
        "(s STRING)", "DECIMAL(10,2)",
        r"try_cast(nullif(regexp_replace(trim(s), '[$,\\r]', ''), '')"
        r" AS DECIMAL(10,2))"),
    # cleaning.sanitize_numstr
    "sanitize_numstr": (
        "(s STRING)", "STRING",
        r"nullif(regexp_replace(regexp_replace(s, '^\\s+|\\s+$', ''),"
        r" '\\.0+$', ''), '')"),
    # cleaning.norm_bool with the loader truthy ladder, NULL -> false
    "norm_bool_loader": (
        "(s STRING)", "BOOLEAN",
        "CASE WHEN s IS NULL THEN false ELSE"
        " lower(trim(s)) IN ('true', '1', 't', 'y', 'yes') END"),
    # cleaning.norm_bool with the SQL truthy ladder, NULL -> false
    "norm_bool_sql": (
        "(s STRING)", "BOOLEAN",
        "CASE WHEN s IS NULL THEN false ELSE"
        " lower(trim(s)) IN ('t', 'true', '1') END"),
    # dates.tsql_week_start / week_end (Sunday -> NEXT Monday's week)
    "tsql_week_start": (
        "(d DATE)", "DATE",
        "to_date(date_trunc('week', date_add(d, 1)))"),
    "tsql_week_end": (
        "(d DATE)", "DATE",
        "date_add(to_date(date_trunc('week', date_add(d, 1))), 6)"),
    # text.token_count
    "token_count": (
        "(s STRING)", "BIGINT",
        r"CAST(CASE WHEN trim(s) = '' THEN 0"
        r" ELSE size(split(trim(s), '\\s+', -1)) END AS BIGINT)"),
    # text.fingerprint (md5 exact-dedup key)
    "doc_fingerprint": (
        "(s STRING)", "STRING",
        r"md5(lower(regexp_replace(trim(s), '\\s+', ' ')))"),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the scalar surface as temporary SQL functions on this
    session; returns the registered names. Idempotent (OR REPLACE)."""
    for name, (sig, ret, body) in _SQL_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
                  f"RETURNS {ret} RETURN {body}")
    return list(_SQL_FUNCTIONS)
