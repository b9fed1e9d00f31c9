"""CLI: run the full ETL over a directory of Inside-Airbnb-shaped
csv.gz files (the reference's `python main.py` menu option 4).

    python -m sql_etl_data_warehouse_inside_airbnb_spark [--incremental] <data_dir> [output_dir]

``--incremental`` re-loads into an existing warehouse at output_dir
(MERGE listings, append-if-absent reviews/calendar weeks, stable
date_ids) instead of rebuilding.
"""

from __future__ import annotations

import sys

from sql_etl_data_warehouse_inside_airbnb_spark.plans.etl import run_pipeline
from sql_etl_data_warehouse_inside_airbnb_spark.session import get_spark


def main(argv: list[str]) -> int:
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__.strip())
        return 0 if argv else 2
    incremental = "--incremental" in argv
    argv = [a for a in argv if a != "--incremental"]
    data_dir = argv[0]
    output_dir = argv[1] if len(argv) > 1 else None
    spark = get_spark("sql-etl-dw-inside-airbnb-etl")
    spark.sparkContext.setLogLevel("ERROR")
    tables = run_pipeline(spark, data_dir, output_dir,
                          incremental=incremental)
    for name in ("dim_listings", "dim_listing_id_map", "dim_hosts",
                 "dim_dates", "fact_calendar", "fact_reviews"):
        n = tables.stats.get(name, getattr(tables, name).count())
        print(f"{name}: {n} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
