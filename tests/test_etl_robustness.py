"""Regression pins for the round-4 ETL review findings: incremental
runs must never destroy accumulated state (dim_dates wipe, placeholder
schema poisoning, non-crash-safe swaps), and the persisted facts must
actually partition by their time bucket."""

from __future__ import annotations

import csv
import glob
import gzip
import os
import shutil

from sql_etl_data_warehouse_inside_airbnb_spark.plans.etl import run_pipeline

LISTING_COLS = ["id", "host_id", "host_name", "host_location",
                "neighbourhood_cleansed", "latitude", "longitude", "price",
                "number_of_reviews", "review_scores_rating",
                "calculated_host_listings_count"]
REVIEW_COLS = ["listing_id", "id", "date", "reviewer_id", "reviewer_name",
               "comments"]
CALENDAR_COLS = ["listing_id", "date", "available", "price"]


def _wgz(dirpath, name, header, rows):
    with gzip.open(os.path.join(dirpath, name), "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def _day1(tmp_path):
    day1 = tmp_path / "day1"
    day1.mkdir()
    _wgz(day1, "France_Paris_listings_2025-06-01.csv.gz", LISTING_COLS, [
        [101, 9001, "Ana", "Paris, France", "Marais", "48.85", "2.35",
         "$100.00", "10", "4.50", "2"],
    ])
    _wgz(day1, "France_Paris_calendar_2025-06-01.csv.gz", CALENDAR_COLS, [
        [101, "2025-06-02", "t", "$100.00"],
    ])
    _wgz(day1, "France_Paris_reviews_2025-06-01.csv.gz", REVIEW_COLS, [
        [101, 1, "2025-05-01", 71, "Zoe", "nice"],
    ])
    return day1


def test_incremental_listings_only_keeps_dim_dates(spark, tmp_path):
    """A day-2 dir with ONLY a listings file must not wipe the
    accumulated date dimension (or facts)."""
    out = tmp_path / "wh"
    t1 = run_pipeline(spark, str(_day1(tmp_path)), str(out))
    assert t1.stats["dim_dates"] > 0
    n_dates = t1.stats["dim_dates"]

    day2 = tmp_path / "day2"
    day2.mkdir()
    _wgz(day2, "France_Paris_listings_2025-06-08.csv.gz", LISTING_COLS, [
        [102, 9002, "Bob", "Lyon, France", "Opera", "48.87", "2.33",
         "$80.00", "5", "4.00", "1"],
    ])
    t2 = run_pipeline(spark, str(day2), str(out), incremental=True)
    assert t2.stats["dim_dates"] == n_dates        # kept, not wiped
    assert t2.stats["fact_reviews"] == 1
    assert t2.stats["fact_calendar"] == 1
    # schema intact (9 real columns, not a 2-col placeholder)
    assert len(t2.dim_dates.columns) == 9


def test_placeholder_schemas_survive_roundtrip(spark, tmp_path):
    """Run 1 without calendar/review files persists EMPTY facts with
    the REAL schemas; run 2 with those files must union cleanly."""
    day1 = tmp_path / "d1"
    day1.mkdir()
    _wgz(day1, "France_Paris_listings_2025-06-01.csv.gz", LISTING_COLS, [
        [101, 9001, "Ana", "Paris, France", "Marais", "48.85", "2.35",
         "$100.00", "10", "4.50", "2"],
    ])
    out = tmp_path / "wh"
    t1 = run_pipeline(spark, str(day1), str(out))
    assert t1.stats["fact_calendar"] == 0
    assert len(t1.fact_calendar.columns) == 5
    # real columns (+ the review_lang enrichment), not a 1-col stub
    assert {"review_id", "listing_id", "date_id", "reviewer_id",
            "reviewer_name", "comments",
            "review_date"} <= set(t1.fact_reviews.columns)
    assert len(t1.dim_dates.columns) == 9

    day2 = tmp_path / "d2"
    day2.mkdir()
    _wgz(day2, "France_Paris_listings_2025-06-08.csv.gz", LISTING_COLS, [
        [101, 9001, "Ana", "Paris, France", "Marais", "48.85", "2.35",
         "$100.00", "10", "4.50", "2"],
    ])
    _wgz(day2, "France_Paris_calendar_2025-06-08.csv.gz", CALENDAR_COLS, [
        [101, "2025-06-09", "t", "$150.00"],
    ])
    _wgz(day2, "France_Paris_reviews_2025-06-08.csv.gz", REVIEW_COLS, [
        [101, 5, "2025-06-09", 75, "Kim", "ok"],
    ])
    t2 = run_pipeline(spark, str(day2), str(out), incremental=True)
    assert t2.stats["fact_calendar"] == 1
    assert t2.stats["fact_reviews"] == 1


def test_incremental_swap_recovers_from_crash(spark, tmp_path):
    """Simulate a kill inside the table-swap window (table renamed to
    .__old, new one not yet in place): the next incremental run must
    restore the prior warehouse instead of full-rebuilding from the
    partial day-2 dir."""
    out = tmp_path / "wh"
    t1 = run_pipeline(spark, str(_day1(tmp_path)), str(out))
    assert t1.stats["fact_reviews"] == 1

    # crash simulation on fact_reviews
    fr = os.path.join(str(out), "fact_reviews")
    os.rename(fr, fr + ".__old")

    day2 = tmp_path / "day2"
    day2.mkdir()
    _wgz(day2, "France_Paris_listings_2025-06-08.csv.gz", LISTING_COLS, [
        [102, 9002, "Bob", "Lyon, France", "Opera", "48.87", "2.33",
         "$80.00", "5", "4.00", "1"],
    ])
    _wgz(day2, "France_Paris_reviews_2025-06-08.csv.gz", REVIEW_COLS, [
        [102, 9, "2025-06-09", 79, "Ly", "fine"],
    ])
    t2 = run_pipeline(spark, str(day2), str(out), incremental=True)
    # day1's review survived the simulated crash + retry
    assert t2.stats["fact_reviews"] == 2
    assert t2.stats["dim_listings"] == 2
    assert not os.path.exists(fr + ".__old")


def test_fact_reviews_partitioned_by_month(spark, tmp_path):
    out = tmp_path / "wh"
    run_pipeline(spark, str(_day1(tmp_path)), str(out))
    parts = glob.glob(os.path.join(str(out), "fact_reviews",
                                   "part_month=*"))
    assert parts, "fact_reviews must persist hive-partitioned by month"
    assert os.path.basename(parts[0]) == "part_month=2025-05"


def test_reject_slices_distinct_for_identical_basenames(spark, tmp_path):
    """Two genuinely different loads shipping IDENTICAL filenames
    (undated feeds like 'listings.csv.gz') must land in distinct
    load_batch= slices — the batch id folds each file's size/mtime, so
    the later load never silently overwrites the earlier load's
    rejects in the cumulative audit log."""
    out = tmp_path / "wh"
    day1 = tmp_path / "d1"
    day1.mkdir()
    _wgz(day1, "France_Paris_listings_2025-06-01.csv.gz", LISTING_COLS, [
        [101, 9001, "Ana", "Paris, France", "Marais", "48.85", "2.35",
         "$100.00", "10", "4.50", "2"],
        ["not-an-id", 9009, "Bad", "", "", "", "", "", "", "", ""],
    ])
    t1 = run_pipeline(spark, str(day1), str(out))
    assert t1.stats["rejects_listings"] == 1

    day2 = tmp_path / "d2"
    day2.mkdir()
    # SAME basename, different content (different reject row)
    _wgz(day2, "France_Paris_listings_2025-06-01.csv.gz", LISTING_COLS, [
        [102, 9002, "Bob", "Lyon, France", "Opera", "48.87", "2.33",
         "$80.00", "5", "4.00", "1"],
        ["also-bad", 9010, "Bad2", "", "", "", "", "", "", "", ""],
    ])
    t2 = run_pipeline(spark, str(day2), str(out), incremental=True)
    assert t2.stats["rejects_listings"] == 1
    slices = glob.glob(os.path.join(str(out), "rejects_listings",
                                    "load_batch=*"))
    assert len(slices) == 2, slices
    # both loads' rejects survive in the cumulative log
    log = spark.read.parquet(os.path.join(str(out), "rejects_listings"))
    assert log.count() == 2
