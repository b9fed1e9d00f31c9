"""Date/time expressions, including the reference's exact week bucketing.

The single subtlest semantic in the reference (SURVEY §7.3): T-SQL
``DATEADD(wk, DATEDIFF(wk, 0, d), 0)`` (sql/data/04_load_calendar.sql:28)
labels Sun..Sat with the *following* Monday — a Sunday lands in the NEXT
labeled week, unlike ISO ``date_trunc('week')`` which puts Sunday at the
end of the previous Monday's week. Exact reproduction:
``week_start = date_trunc('week', d + 1 day)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tsql_week_start(col: Column | str) -> Column:
    """T-SQL DATEADD/DATEDIFF week start (Sun..Sat → containing-or-next
    Monday). sql/data/04_load_calendar.sql:28."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_date(F.date_trunc("week", F.date_add(F.to_date(c), 1)))


def tsql_week_end(col: Column | str) -> Column:
    """week_end = week_start + 6 days (sql/data/04_load_calendar.sql:29)."""
    return F.date_add(tsql_week_start(col), 6)


def date_parts(col: Column | str) -> list[Column]:
    """dim_dates derivation (modules/data_loader.py:503-511):
    year, quarter, month, month_name, day, day_name, is_weekend
    (is_weekend = Sat/Sun, python ``weekday() >= 5``)."""
    d = F.to_date(F.col(col) if isinstance(col, str) else col)
    return [
        F.year(d).alias("year"),
        F.quarter(d).alias("quarter"),
        F.month(d).alias("month"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.dayofmonth(d).alias("day"),
        F.date_format(d, "EEEE").alias("day_name"),
        F.dayofweek(d).isin(1, 7).alias("is_weekend"),
    ]


def date_dimension(min_date: Column, max_date: Column, src_df):
    """Build a gap-free dim_dates between the min/max of a source column
    via ``sequence`` + ``explode`` — replaces the reference's driver-side
    ``timedelta`` loop (modules/data_loader.py:492-498) with a fully
    distributed generator; ``date_id`` is a deterministic
    ``row_number() over (order by full_date)`` replacement for the SQL
    Server IDENTITY column (SURVEY §7.3 surrogate keys)."""
    from pyspark.sql import Window

    bounds = src_df.agg(F.min(min_date).alias("lo"), F.max(max_date).alias("hi"))
    days = bounds.select(
        F.explode(F.sequence(F.to_date("lo"), F.to_date("hi"))).alias("full_date")
    )
    w = Window.orderBy("full_date")
    return days.select(
        F.row_number().over(w).alias("date_id"),
        "full_date",
        *date_parts(F.col("full_date")),
    )
