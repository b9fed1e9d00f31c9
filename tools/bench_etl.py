"""ETL throughput bench: synthesize Inside-Airbnb-shaped csv.gz inputs
at a configurable scale, run the full pipeline (clean -> dims -> facts),
and print ONE JSON line with rows/sec.

The reference publishes no timings (BASELINE.md) — its README row
counts imply a full-corpus load of ~62M calendar + 6.4M review rows
through 500-row pyodbc batches. This bench measures the same logical
workload on the Spark engine so the single-node throughput claim is
backed by a number.

Usage: python tools/bench_etl.py [n_listings] [days] [reviews_per_listing]
       (defaults: 20000 listings x 30 days = 600k calendar rows)
"""

from __future__ import annotations

import csv
import gzip
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize(data_dir: str, n_listings: int, days: int,
               reviews_per: int) -> dict[str, int]:
    """Deterministic corpus: one city file per kind, messy in the ways
    the pipeline must handle (uncastable ids, $ prices, bool strings)."""
    lst = os.path.join(data_dir, "France_Paris_listings_2025-06-01.csv.gz")
    cal = os.path.join(data_dir, "France_Paris_calendar_2025-06-01.csv.gz")
    rev = os.path.join(data_dir, "France_Paris_reviews_2025-06-01.csv.gz")

    with gzip.open(lst, "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "host_id", "host_name", "host_location",
                    "neighbourhood_cleansed", "latitude", "longitude",
                    "price", "number_of_reviews", "review_scores_rating",
                    "calculated_host_listings_count"])
        for i in range(n_listings):
            lid = f"bad{i}" if i % 1000 == 999 else str(i)   # quarantine rows
            w.writerow([lid, i % (n_listings // 2 or 1), f"Host{i}",
                        "Paris, France", f"Quartier{i % 40}",
                        f"48.{850000 + i % 99999}", f"2.{350000 + i % 99999}",
                        f"${100 + i % 400}.00", i % 50,
                        f"{3 + (i % 20) / 10:.1f}", 1 + i % 5])
    with gzip.open(cal, "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(["listing_id", "date", "available", "price"])
        for i in range(n_listings):
            for d in range(days):
                w.writerow([i, f"2025-06-{d % 30 + 1:02d}",
                            "t" if (i + d) % 2 else "f",
                            f"${100 + i % 400}.00"])
    with gzip.open(rev, "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(["listing_id", "id", "date", "reviewer_id",
                    "reviewer_name", "comments"])
        rid = 0
        for i in range(n_listings):
            for r in range(reviews_per):
                w.writerow([i, rid, f"2025-05-{r % 28 + 1:02d}", rid % 9999,
                            f"Rev{rid}", f"nice place number {i} visit {r}"])
                rid += 1
    return {"listings": n_listings, "calendar": n_listings * days,
            "reviews": n_listings * reviews_per}


def main() -> None:
    n_listings = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    days = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    reviews_per = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from sql_etl_data_warehouse_inside_airbnb_spark.plans.etl import (
        run_pipeline,
    )
    from sql_etl_data_warehouse_inside_airbnb_spark.session import get_spark

    data_dir = tempfile.mkdtemp(prefix="etl_bench_src_")
    out_dir = tempfile.mkdtemp(prefix="etl_bench_wh_")
    try:
        counts = synthesize(data_dir, n_listings, days, reviews_per)
        in_rows = sum(counts.values())
        spark = get_spark("etl-bench")
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.perf_counter()
        tables = run_pipeline(spark, data_dir, out_dir)
        elapsed = time.perf_counter() - t0
        print(json.dumps({
            "metric": "etl_throughput",
            "value": round(in_rows / elapsed),
            "unit": "input_rows_per_sec",
            "elapsed_sec": round(elapsed, 3),
            "input_rows": counts,
            "output_rows": tables.stats,
        }))
        spark.stop()
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
