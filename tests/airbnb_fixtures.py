"""Airbnb-shaped messy fixtures per FIXTURES.md — the value distributions
that make the reference's semantics observable (try_cast quarantine,
boolean ladders, week bucketing incl. Sundays, dup review ids)."""

from __future__ import annotations

LISTINGS_COLS = ["id", "host_id", "host_name", "host_location",
                 "neighbourhood_cleansed", "latitude", "longitude", "price",
                 "number_of_reviews", "review_scores_rating",
                 "calculated_host_listings_count"]

LISTINGS_ROWS = [
    # clean row
    ("101", "7", "Alice", "Paris, France", "Marais", "48.8566", "2.3522",
     "$1,234.00", "12", "4.87", "3"),
    # float-suffix host_id, money with \r, 3-part location
    ("102", "8.0", "Bob", "Lyon, Rhone, France", "Centre", "45.76", "4.83",
     "$85.00\r", "5.0", "4.5", "1"),
    # bare-country location, empty price
    ("103", "7", "Alice", "France", None, "43.7", "7.26", "", "0", "", "3"),
    # unparsable id -> quarantined from dim, kept in id_map
    ("notanid9999999999999999999", "9", "Mallory", "", "X", "junk", "junk",
     "junk", "junk", "junk", "junk"),
    # 19-digit id near int64 max (valid), long host name
    ("9223372036854775806", "10", "H" * 300, "Berlin, Germany", None,
     "52.52", "13.40", "$99.99", "7", "5.0", "2"),
    # duplicate id within batch (MERGE pre-dedup requirement)
    ("101", "7", "Alice-dup", "Paris, France", "Marais", "48.8566", "2.3522",
     "$999.00", "13", "4.9", "3"),
]

CALENDAR_COLS = ["listing_id", "date", "available", "price"]

# week of 2025-06-08 (Sunday) .. 2025-06-14 (Saturday): T-SQL buckets the
# Sunday into the NEXT Monday's (2025-06-09) week
CALENDAR_ROWS = [
    ("101", "2025-06-08", "t", "$100.00"),      # Sunday → week 2025-06-09
    ("101", "2025-06-09", "true", "$110.00"),   # Monday
    ("101", "2025-06-10", " t ", "$120.00"),    # padded truthy
    ("101", "2025-06-11", "f", "$1,000.00"),
    ("101", "2025-06-12", "F", ""),             # empty price → excluded from AVG
    ("101", "2025-06-13", "1", "$90.00\r"),
    ("101", "2025-06-14", "0", "$80.00"),       # Saturday, falsy
    ("101", "2025-06-15", "t", "$70.00"),       # next Sunday → week 2025-06-16
    ("102", "2025-06-09", "junk", "$50.00"),    # junk bool → 0
    ("999", "2025-06-09", "t", "$10.00"),       # orphan listing → dropped by join
    ("101", "not-a-date", "t", "$10.00"),       # unparsable date → dropped
]

REVIEWS_COLS = ["listing_id", "id", "date", "reviewer_id", "reviewer_name",
                "comments"]

REVIEWS_ROWS = [
    ("101", "1", "2025-06-09", "501", "Rev A", "Great place to stay"),
    ("101", "1", "2025-06-10", "502", "Rev B", "dup review id"),   # W2 dedup
    ("102", "2", "2025-06-11", "503", "R" * 300, "C" * 5000),      # truncation
    ("999", "3", "2025-06-12", "504", "Rev D", "orphan listing"),  # J3 drop
    ("101", "4", "junk-date", "505", "Rev E", "bad date"),         # J2 drop
    ("101", "junk", "2025-06-09", "506", "Rev F", "bad id"),       # cast drop
]


def make_raw(spark, rows, cols):
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField(c, StringType(), True) for c in cols])
    return spark.createDataFrame(rows, schema)
