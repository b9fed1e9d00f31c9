"""End-to-end pipeline semantics on the messy Airbnb fixtures
(FIXTURES.md invariants)."""

from __future__ import annotations

from decimal import Decimal

from airbnb_fixtures import (
    CALENDAR_COLS,
    CALENDAR_ROWS,
    LISTINGS_COLS,
    LISTINGS_ROWS,
    REVIEWS_COLS,
    REVIEWS_ROWS,
    make_raw,
)

from sql_etl_data_warehouse_inside_airbnb_spark.plans.pipeline import (
    build_dim_dates,
    build_dim_hosts,
    build_dim_listings,
    build_fact_calendar,
    build_fact_reviews,
    clean_listings,
    register_views,
)


def _dim_listings(spark):
    raw = make_raw(spark, LISTINGS_ROWS, LISTINGS_COLS)
    cleaned = clean_listings(raw, property_city="Paris",
                             property_country="France")
    res, id_map = build_dim_listings(cleaned)
    return res, id_map


def test_dim_listings_quarantine_and_dedup(spark):
    res, id_map = _dim_listings(spark)
    dim = res.df
    rows = {r.listing_id: r for r in dim.collect()}
    # bad id excluded from dim; duplicate 101 merged to ONE row
    assert set(rows) == {101, 102, 103, 9223372036854775806}
    # id_map preserves ALL staged rows incl. the unparsable id, with splits
    assert id_map.count() == len(LISTINGS_ROWS)   # dup 101 kept twice
    m = {r.listing_raw_id: r for r in id_map.collect()}
    bad = m["notanid9999999999999999999"]
    assert bad.listing_id is None
    assert bad.part1 == "notani" and bad.part2 == "d99999" and bad.part3 == "999999"
    # source dups reported
    assert res.source_dups_dropped == 1


def test_dim_listings_typing(spark):
    res, _ = _dim_listings(spark)
    r101 = res.df.filter("listing_id = 101").collect()[0]
    assert r101.host_city == "Paris" and r101.host_country == "France"
    assert r101.price in (Decimal("1234.00"), Decimal("999.00"))
    r102 = res.df.filter("listing_id = 102").collect()[0]
    assert r102.host_id == 8                       # "8.0" sanitized
    assert r102.host_city == "Lyon, Rhone"         # 3-part split: last = country
    assert r102.price == Decimal("85.00")          # \r stripped
    r103 = res.df.filter("listing_id = 103").collect()[0]
    assert r103.host_city == "Unknown" and r103.host_country == "France"
    assert r103.price is None                      # empty -> NULL not 0
    big = res.df.filter("listing_id = 9223372036854775806").collect()[0]
    assert len(big.host_name) == 255               # NVARCHAR(255) truncation


def test_merge_upsert_rerun_updates_not_duplicates(spark):
    res1, _ = _dim_listings(spark)
    raw = make_raw(spark, LISTINGS_ROWS, LISTINGS_COLS)
    cleaned = clean_listings(raw, "Paris", "France")
    res2, _ = build_dim_listings(cleaned, existing=res1.df)
    assert res2.df.count() == res1.df.count()      # idempotent re-load
    assert res2.inserted == 0 and res2.updated == 4


def test_dim_hosts(spark):
    res, _ = _dim_listings(spark)
    hosts = {r.host_id: r for r in build_dim_hosts(res.df).collect()}
    assert hosts[7].total_listings == 2            # listings 101 + 103
    assert set(hosts) == {7, 8, 10}


def test_audit_columns_frozen_clock(spark):
    """F11 (GETDATE() audit columns): with the injected clock the
    created/updated audit timestamps are exactly assertable — the
    wall-clock default makes them only non-null-checkable."""
    from datetime import datetime

    frozen = "2024-06-01 12:00:00"
    want = datetime(2024, 6, 1, 12, 0, 0)
    raw = make_raw(spark, LISTINGS_ROWS, LISTINGS_COLS)
    cleaned = clean_listings(raw, property_city="Paris",
                             property_country="France")
    res, id_map = build_dim_listings(cleaned, audit_time=frozen)
    for r in res.df.collect():
        assert r.created_date == want and r.updated_date == want
    assert all(r.created_date == want for r in id_map.collect())
    hosts = build_dim_hosts(res.df, audit_time=frozen)
    assert all(r.created_date == want for r in hosts.collect())
    # the default stays wall-clock (non-null, fresh)
    res2, _ = build_dim_listings(cleaned)
    assert all(r.created_date is not None for r in res2.df.collect())


def test_week_bucketing_sunday_edge(spark):
    res, _ = _dim_listings(spark)
    cal = make_raw(spark, CALENDAR_ROWS, CALENDAR_COLS)
    fact = build_fact_calendar(cal, res.df)
    rows = {(r.listing_id, str(r.week_start_date)): r for r in fact.collect()}
    # Sunday 06-08 goes into the 06-09 week; Sunday 06-15 into 06-16 week
    wk = rows[(101, "2025-06-09")]
    assert wk.available_days_per_week == 4          # t,true," t ",1
    # avg over non-null parsed prices only: 100,110,120,1000,90,80 → 250
    assert wk.avg_price_per_week == Decimal("250.00")
    assert str(wk.week_end_date) == "2025-06-15"
    assert (101, "2025-06-16") in rows
    # orphan listing 999 dropped by FK join; junk bool counts 0
    assert (999, "2025-06-09") not in rows
    assert rows[(102, "2025-06-09")].available_days_per_week == 0


def test_fact_reviews_dedup_anti_join(spark):
    res, _ = _dim_listings(spark)
    reviews = make_raw(spark, REVIEWS_ROWS, REVIEWS_COLS)
    cal = make_raw(spark, CALENDAR_ROWS, CALENDAR_COLS)
    dates = build_dim_dates(reviews, cal)
    fact = build_fact_reviews(reviews, res.df, dates)
    rows = {r.review_id: r for r in fact.collect()}
    # dup id 1 → one survivor; orphan/bad-date/bad-id dropped
    assert set(rows) == {1, 2}
    assert len(rows[2].reviewer_name) == 255 and len(rows[2].comments) == 4000
    # idempotent append: re-run with existing → zero new rows
    again = build_fact_reviews(reviews, res.df, dates, existing=fact)
    assert again.count() == 0


def test_dim_dates_gap_free(spark):
    cal = make_raw(spark, CALENDAR_ROWS, CALENDAR_COLS)
    dd = build_dim_dates(cal).collect()
    assert len(dd) == 8                             # 06-08..06-15 contiguous
    by_date = {str(r.full_date): r for r in dd}
    assert by_date["2025-06-08"].is_weekend is True
    assert by_date["2025-06-09"].is_weekend is False
    assert by_date["2025-06-09"].day_name == "Monday"
    assert [r.date_id for r in sorted(dd, key=lambda r: r.full_date)] == list(
        range(1, 9))


def test_views(spark):
    res, _ = _dim_listings(spark)
    register_views(spark, res.df)
    nb = spark.sql("SELECT * FROM vw_neighborhood_performance").collect()
    assert {r.property_neighbourhood for r in nb} >= {"Marais"}
    # host 7 has listings at two lat/lon points → counted in two groups
    ha = spark.sql(
        "SELECT SUM(unique_hosts) AS s FROM vw_host_activity").collect()
    assert ha[0].s == 4
    lf = spark.sql("SELECT SUM(listing_count) AS n "
                   "FROM vw_local_foreign_analysis").collect()
    assert lf[0].n == 4


def test_reviews_cap_reproduction(spark):
    # the reference's >200k 80% sampling cap (data_loader.py:427-431),
    # off by default, exact mode matches int(0.8*n) exactly
    from pyspark.sql import functions as F
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.pipeline import (
        cap_reviews,
    )
    df = spark.range(1000).select(F.col("id").alias("review_id"))
    # under the threshold: untouched
    assert cap_reviews(df, max_rows=1000, key_col="review_id").count() == 1000
    # over the threshold, exact mode: exactly int(0.8 * n) rows
    assert cap_reviews(df, max_rows=100, exact=True,
                       key_col="review_id").count() == 800
    # exact mode selects by seeded key hash, so the SUBSET (not just
    # its size) is invariant to the input partition layout
    pick = lambda d: sorted(  # noqa: E731
        r.review_id for r in cap_reviews(d, max_rows=100, exact=True,
                                         key_col="review_id").collect())
    assert pick(df.repartition(13)) == pick(df.coalesce(1))
    # fraction mode: approximate but seeded-deterministic
    a = cap_reviews(df, max_rows=100, key_col="review_id").count()
    b = cap_reviews(df, max_rows=100, key_col="review_id").count()
    assert a == b and 700 <= a <= 900
