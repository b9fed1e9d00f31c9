"""Incremental (day-2) re-load semantics: MERGE upsert for listings,
append-if-absent reviews, insert-if-absent calendar weeks, stable
date_ids, id-map append, hosts rebuild."""

from __future__ import annotations

import csv
import gzip
import os

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


def test_day2_incremental_load(spark, tmp_path):
    day1 = tmp_path / "day1"
    day2 = tmp_path / "day2"
    out = tmp_path / "wh"
    day1.mkdir(), day2.mkdir()

    _wgz(day1, "France_Paris_listings_2025-06-01.csv.gz", LISTING_COLS, [
        [101, 9001, "Ana", "Paris, France", "Marais", "48.85", "2.35",
         "$100.00", "10", "4.50", "2"],
        [102, 9002, "Bob", "Lyon, France", "Opera", "48.87", "2.33",
         "$80.00", "5", "4.00", "1"],
    ])
    _wgz(day1, "France_Paris_calendar_2025-06-01.csv.gz", CALENDAR_COLS, [
        [101, "2025-06-02", "t", "$100.00"],
        [101, "2025-06-03", "f", "$110.00"],
    ])
    _wgz(day1, "France_Paris_reviews_2025-06-01.csv.gz", REVIEW_COLS, [
        [101, 1, "2025-05-01", 71, "Zoe", "nice"],
        [102, 2, "2025-05-02", 72, "Yan", "good"],
    ])
    t1 = run_pipeline(spark, str(day1), str(out))
    assert t1.stats["dim_listings"] == 2
    d1_dates = {r.full_date: r.date_id
                for r in t1.dim_dates.select("date_id", "full_date").collect()}

    # day 2: listing 101 price changes (MERGE update), 103 is new
    # (MERGE insert); review 2 re-arrives (must not duplicate), 3 is
    # new; calendar re-ships the same week for 101 (must not duplicate)
    # plus a new week
    _wgz(day2, "France_Paris_listings_2025-06-08.csv.gz", LISTING_COLS, [
        [101, 9001, "Ana", "Paris, France", "Marais", "48.85", "2.35",
         "$150.00", "12", "4.60", "2"],
        [103, 9003, "Cal", "Nice, France", "Port", "43.70", "7.26",
         "$60.00", "0", "", "1"],
    ])
    _wgz(day2, "France_Paris_calendar_2025-06-08.csv.gz", CALENDAR_COLS, [
        [101, "2025-06-02", "f", "$999.00"],   # same week -> ignored
        [101, "2025-06-09", "t", "$150.00"],   # new week
        [103, "2025-06-10", "t", "$60.00"],
    ])
    _wgz(day2, "France_Paris_reviews_2025-06-08.csv.gz", REVIEW_COLS, [
        [102, 2, "2025-05-02", 72, "Yan", "good"],          # dup -> skipped
        [103, 3, "2025-06-09", 73, "Xia", "fresh"],
    ])
    t2 = run_pipeline(spark, str(day2), str(out), incremental=True)

    assert t2.stats["dim_listings"] == 3
    prices = {r.listing_id: str(r.price)
              for r in t2.dim_listings.select("listing_id", "price").collect()}
    assert prices[101] == "150.00"          # source wins on match
    assert prices[102] == "80.00"           # untouched rows survive
    assert t2.stats["dim_hosts"] == 3       # rebuilt from merged dim
    assert t2.stats["dim_listing_id_map"] == 4  # 2 + 2 appended

    # reviews: day1's 2 + one new; the re-sent id 2 did not duplicate
    assert t2.stats["fact_reviews"] == 3

    # calendar: day1 week kept with its ORIGINAL aggregate; new weeks in
    fc = {(r.listing_id, str(r.week_start_date)):
          str(r.avg_price_per_week)
          for r in t2.fact_calendar.collect()}
    assert len(fc) == 3
    assert fc[(101, "2025-06-02")] == "105.00"   # day1 value, not 999
    assert (101, "2025-06-09") in fc and (103, "2025-06-09") in fc

    # date_ids stable: every day1 id unchanged, new dates numbered past
    d2_dates = {r.full_date: r.date_id
                for r in t2.dim_dates.select("date_id", "full_date").collect()}
    for fd, did in d1_dates.items():
        assert d2_dates[fd] == did
    new_ids = [v for k, v in d2_dates.items() if k not in d1_dates]
    assert new_ids and min(new_ids) > max(d1_dates.values())


def test_enrichment_columns(spark, tmp_path):
    """pretreatment + language-detection enrichment: state-abbrev host
    country -> United States, is_local_host from corrected country,
    review_lang present on fact_reviews."""
    day1 = tmp_path / "in"
    day1.mkdir()
    _wgz(day1, "France_Paris_listings_2025-06-01.csv.gz", LISTING_COLS, [
        [201, 8001, "Ana", "Paris, France", "Marais", "48.85", "2.35",
         "$100.00", "1", "4.0", "1"],          # local: France == France
        [202, 8002, "Tex", "TX", "Opera", "48.87", "2.33",
         "$90.00", "2", "4.1", "1"],           # TX -> United States
    ])
    _wgz(day1, "France_Paris_reviews_2025-06-01.csv.gz", REVIEW_COLS, [
        [201, 11, "2025-05-01", 71, "Zoe",
         "the quick brown fox and the lazy dog were here with this"],
        [202, 12, "2025-05-02", 72, "Yan", ""],
    ])
    t = run_pipeline(spark, str(day1), str(tmp_path / "wh2"))

    rows = {r.listing_id: r for r in t.dim_listings.collect()}
    assert rows[201].host_country_corrected == "France"
    assert rows[201].is_local_host is True
    assert rows[202].host_country == "TX"
    assert rows[202].host_country_corrected == "United States"
    assert rows[202].is_local_host is False
    hosts = {r.host_id: r.host_country_corrected
             for r in t.dim_hosts.collect()}
    assert hosts[8002] == "United States"

    langs = {r.review_id: r.review_lang for r in t.fact_reviews.collect()}
    assert langs[11] == "en"
    assert langs[12] == "und"


def test_reject_sink(spark, tmp_path):
    src = tmp_path / "in2"
    src.mkdir()
    _wgz(src, "France_Paris_listings_2025-06-01.csv.gz", LISTING_COLS, [
        [301, 7001, "Ok", "Paris, France", "X", "1", "2", "$10", "0", "", "1"],
        ["not-an-id", 7002, "Bad", "Y, Z", "X", "1", "2", "$10", "0", "", "1"],
    ])
    t = run_pipeline(spark, str(src), str(tmp_path / "wh3"))
    assert t.stats["dim_listings"] == 1
    assert t.stats["rejects_listings"] == 1
    rej = spark.read.parquet(str(tmp_path / "wh3" / "rejects_listings"))
    row = rej.collect()[0]
    assert row.id == "not-an-id"
    assert row.reject_reason == "listing_id_cast_failed"


def test_mid_swap_crash_rolls_forward_without_replay(spark, tmp_path):
    """A run killed mid-swap (journal present, some tables swapped,
    some still staged) must roll FORWARD to the complete new state on
    the next pipeline call — no mixed warehouse, and a retried batch
    never replays id-map/reject appends onto half-merged state."""
    import shutil

    from sql_etl_data_warehouse_inside_airbnb_spark.plans.etl import (
        _SWAP_JOURNAL,
        CORE_TABLES,
    )

    day1 = tmp_path / "day1"
    day2 = tmp_path / "day2"
    out = tmp_path / "wh"
    day1.mkdir(), day2.mkdir()
    _wgz(day1, "France_Paris_listings_2025-06-01.csv.gz", LISTING_COLS, [
        [101, 9001, "Ana", "Paris, France", "Marais", "48.85", "2.35",
         "$100.00", "10", "4.50", "2"],
        ["bad_id", 9002, "Bob", "Lyon, France", "Opera", "48.87",
         "2.33", "$80.00", "5", "4.00", "1"],
    ])
    run_pipeline(spark, str(day1), str(out))

    _wgz(day2, "France_Paris_listings_2025-06-08.csv.gz", LISTING_COLS, [
        [103, 9003, "Cal", "Nice, France", "Port", "43.70", "7.26",
         "$60.00", "0", "", "1"],
        ["also_bad", 9004, "Dee", "Nice, France", "Port", "43.71",
         "7.27", "$61.00", "1", "", "1"],
    ])
    t2 = run_pipeline(spark, str(day2), str(out), incremental=True)
    want_idmap = t2.stats["dim_listing_id_map"]
    want_rejects_total = spark.read.parquet(
        str(out / "rejects_listings")).count()
    assert want_rejects_total == 2    # one bad row per day

    # reconstruct the mid-swap crash: day-2 state becomes the staged
    # .__tmp for SOME tables while others are already swapped; the
    # journal says the batch was fully staged
    committed = {n: str(out / n) for n in CORE_TABLES}
    names = list(committed)
    for i, n in enumerate(names):
        if i % 2 == 0:
            continue                      # these "already swapped"
        live = committed[n]
        shutil.move(live, live + ".__tmp")       # staged, not landed
        # the pre-batch live table is irrelevant for roll-forward;
        # simulate it renamed aside already for one of them
        if i == 1:
            os.makedirs(live + ".__old")
    with open(out / _SWAP_JOURNAL, "w") as f:
        f.write("\n".join(names) + "\n")

    # a NO-OP day-3 run (re-reads day2 dir but the journal fires
    # first): recovery must complete the swap, then load the fully
    # committed day-2 warehouse as prior
    t3 = run_pipeline(spark, str(day2), str(out), incremental=True)
    assert not os.path.exists(out / _SWAP_JOURNAL)
    for n in names:
        assert os.path.exists(committed[n])
        assert not os.path.exists(committed[n] + ".__tmp")
        assert not os.path.exists(committed[n] + ".__old")
    # day-3 re-ran the same batch over the COMMITTED day-2 state: the
    # PK-keyed tables stay deduped, and the per-load audit trails grow
    # by exactly one more load's worth (reference semantics), never by
    # a partial-replay amount
    assert t3.stats["dim_listings"] == 2
    assert t3.stats["dim_listing_id_map"] == want_idmap + 2
    # rejects are per-load SLICES keyed by a deterministic batch id:
    # re-running the same batch overwrites its own slice, so the
    # audit log never grows from retries
    assert spark.read.parquet(
        str(out / "rejects_listings")).count() == want_rejects_total
