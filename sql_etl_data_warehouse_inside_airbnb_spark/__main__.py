"""CLI: run the full ETL over a directory of Inside-Airbnb-shaped
csv.gz files (the reference's `python main.py` menu option 4), or
profile raw files before loading (menu option 1).

    python -m sql_etl_data_warehouse_inside_airbnb_spark [--incremental] [--reviews-cap] <data_dir> [output_dir]
    python -m sql_etl_data_warehouse_inside_airbnb_spark --profile <file.csv.gz> [...]
    python -m sql_etl_data_warehouse_inside_airbnb_spark --sql [--dialect tsql|spark] <warehouse_dir> "<query>"

``--incremental`` re-loads into an existing warehouse at output_dir
(MERGE listings, append-if-absent reviews/calendar weeks, stable
date_ids) instead of rebuilding. ``--reviews-cap`` reproduces the
reference's >200k-row 80% reviews sampling cap (off by default — it
drops data; see plans/pipeline.py:cap_reviews). ``--profile`` prints
a per-column EDA profile (nulls, distincts, min/max) of each given
raw csv.gz, schema-on-read, one Spark job per file. ``--sql`` queries
a previously built warehouse (the reference's analysis-script menu
entries): every dim_*/fact_* parquet directory registers as a view,
the three vw_* analytical views are created, and the statement runs
in the chosen dialect. The default ``--dialect tsql`` translates the
reference's own analysis surface (SELECT TOP, CONVERT, LEN, ISNULL,
DATEADD/DATEDIFF) through functions/tsql.py — T-SQL NAMES get T-SQL
SEMANTICS there (LEN ignores trailing spaces; 3-arg DATEDIFF counts
boundary crossings; Spark's own 2-arg datediff passes through), and
anything outside the shim's scope raises rather than mistranslating.
Pass ``--dialect spark`` to run untranslated Spark SQL.
"""

from __future__ import annotations

import sys

from sql_etl_data_warehouse_inside_airbnb_spark.plans.etl import run_pipeline
from sql_etl_data_warehouse_inside_airbnb_spark.session import get_spark


def main(argv: list[str]) -> int:
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__.strip())
        return 0 if argv else 2

    if argv[0] == "--profile":
        from sql_etl_data_warehouse_inside_airbnb_spark.operators.quality import (
            profile_csv_file,
        )
        paths = argv[1:]
        if not paths:
            print(__doc__.strip())
            return 2
        spark = get_spark("sql-etl-dw-inside-airbnb-profile")
        spark.sparkContext.setLogLevel("ERROR")
        for p in paths:
            print(f"== {p}")
            prof = profile_csv_file(spark, p)
            # one output row per COLUMN — show() would cap at 20 and
            # silently hide the rest of a wide listings file
            prof.show(n=10_000, truncate=32)
        spark.stop()
        return 0

    if argv[0] == "--sql":
        args = argv[1:]
        dialect = "tsql"
        if args and args[0] == "--dialect":
            if len(args) < 2 or args[1] not in ("tsql", "spark"):
                print(__doc__.strip())
                return 2
            dialect = args[1]
            args = args[2:]
        if len(args) != 2:
            print(__doc__.strip())
            return 2
        import os

        from sql_etl_data_warehouse_inside_airbnb_spark.functions.sqlfns import (
            register_sql_functions,
        )
        from sql_etl_data_warehouse_inside_airbnb_spark.functions.tsql import (
            run_tsql,
        )
        from sql_etl_data_warehouse_inside_airbnb_spark.plans.pipeline import (
            register_views,
        )
        wh, query = args
        spark = get_spark("sql-etl-dw-inside-airbnb-sql")
        spark.sparkContext.setLogLevel("ERROR")
        register_sql_functions(spark)
        dim_listings = None
        for entry in sorted(os.listdir(wh)):
            path = os.path.join(wh, entry)
            if not os.path.isdir(path):
                continue
            try:
                df = spark.read.parquet(path)
            except Exception:  # noqa: BLE001 - non-table dir, skip
                continue
            df.createOrReplaceTempView(entry)
            if entry == "dim_listings":
                dim_listings = df
        if dim_listings is not None:
            register_views(spark, dim_listings)
        out = (run_tsql(spark, query) if dialect == "tsql"
               else spark.sql(query))
        out.show(n=100, truncate=32)
        spark.stop()
        return 0

    incremental = "--incremental" in argv
    reviews_cap = "--reviews-cap" in argv
    argv = [a for a in argv if a not in ("--incremental", "--reviews-cap")]
    data_dir = argv[0]
    output_dir = argv[1] if len(argv) > 1 else None
    spark = get_spark("sql-etl-dw-inside-airbnb-etl")
    spark.sparkContext.setLogLevel("ERROR")
    tables = run_pipeline(spark, data_dir, output_dir,
                          incremental=incremental, reviews_cap=reviews_cap)
    for name in ("dim_listings", "dim_listing_id_map", "dim_hosts",
                 "dim_dates", "fact_calendar", "fact_reviews"):
        n = tables.stats.get(name, getattr(tables, name).count())
        print(f"{name}: {n} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
