"""End-to-end ETL orchestration — the reference's `main.py` menu option 4
(run_complete_etl, SURVEY §3.1) as one lazy-pipeline call.

File-discovery contract matches the reference (config/settings.py:30-32):
a data directory holding per-city gzip CSVs named
``{Country}_{City}_{kind}_{date}.csv.gz`` with kind ∈ {listings,
calendar, reviews}.

Stages (each a DataFrame lineage, materialized only at sink writes):
  discover → clean listings (per-file geography) → dim_listings MERGE +
  id_map → dim_hosts → dim_dates (gap-free union of calendar+review
  dates) → fact_calendar weekly rollup → fact_reviews → views.

Scale shape: per-city raw files parallelize the gzip scans (gzip is not
splittable — file count IS the parallelism); everything downstream is
partitioned Parquet. Facts join dims via broadcast; the only wide
exchanges are the rollup groupBys.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from glob import glob

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.plans.pipeline import (
    build_dim_dates,
    build_dim_hosts,
    build_dim_listings,
    build_fact_calendar,
    build_fact_reviews,
    clean_listings,
    register_views,
)
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import read_csv_raw

FILENAME_RE = re.compile(
    r"^(?P<country>[^_]+)_(?P<city>[^_]+)_(?P<kind>listings|calendar|reviews)_")


@dataclass
class WarehouseTables:
    dim_listings: DataFrame
    dim_listing_id_map: DataFrame
    dim_hosts: DataFrame
    dim_dates: DataFrame
    fact_calendar: DataFrame
    fact_reviews: DataFrame
    stats: dict[str, int] = field(default_factory=dict)


def discover_files(data_dir: str) -> dict[str, list[tuple[str, str, str]]]:
    """→ {kind: [(path, city, country), ...]} per the reference's glob
    patterns + filename-geography parse (data_cleaner.py:24-46)."""
    out: dict[str, list[tuple[str, str, str]]] = {
        "listings": [], "calendar": [], "reviews": []}
    for path in sorted(glob(os.path.join(data_dir, "*.csv.gz"))):
        m = FILENAME_RE.match(os.path.basename(path))
        if m:
            out[m.group("kind")].append(
                (path, m.group("city"), m.group("country")))
    return out


def run_pipeline(spark: SparkSession, data_dir: str,
                 output_dir: str | None = None) -> WarehouseTables:
    """Full ETL. With ``output_dir``, each warehouse table is persisted
    as Parquet (the typed layer); otherwise everything stays lazy."""
    files = discover_files(data_dir)
    if not files["listings"]:
        raise FileNotFoundError(
            f"no '*_listings_*.csv.gz' files under {data_dir}")

    cleaned = None
    for path, city, country in files["listings"]:
        c = clean_listings(read_csv_raw(spark, path),
                           property_city=city, property_country=country)
        cleaned = c if cleaned is None else cleaned.unionByName(c)

    merge_res, id_map = build_dim_listings(cleaned)
    dim_listings = merge_res.df
    dim_hosts = build_dim_hosts(dim_listings)

    def _union(kind: str) -> DataFrame | None:
        df = None
        for path, _, _ in files[kind]:
            d = read_csv_raw(spark, path)
            df = d if df is None else df.unionByName(d, allowMissingColumns=True)
        return df

    calendar_raw = _union("calendar")
    reviews_raw = _union("reviews")

    date_sources = [d for d in (calendar_raw, reviews_raw) if d is not None]
    dim_dates = (build_dim_dates(*date_sources) if date_sources
                 else spark.createDataFrame([], "date_id int, full_date date"))

    fact_calendar = (build_fact_calendar(calendar_raw, dim_listings)
                     if calendar_raw is not None
                     else spark.createDataFrame(
                         [], "listing_id long, week_start_date date"))
    fact_reviews = (build_fact_reviews(reviews_raw, dim_listings, dim_dates)
                    if reviews_raw is not None
                    else spark.createDataFrame([], "review_id long"))

    register_views(spark, dim_listings)

    tables = WarehouseTables(dim_listings, id_map, dim_hosts, dim_dates,
                             fact_calendar, fact_reviews)
    # the whole star schema is the SQL surface, not just the views
    for name in ("dim_listings", "dim_listing_id_map", "dim_hosts",
                 "dim_dates", "fact_calendar", "fact_reviews"):
        getattr(tables, name).createOrReplaceTempView(name)
    if output_dir:
        # Facts partition by a time bucket so date-range queries prune
        # files instead of scanning the table; at 100 TB this is the
        # difference between reading one month and reading everything.
        # Partition on a derived month (not the raw date) to keep
        # partition counts bounded (~12/year, not 365/year).
        part_col = {
            "fact_calendar": ("week_start_date", "month"),
            "fact_reviews": ("review_date", "month") if
            "review_date" in fact_reviews.columns else None,
        }
        for name in ("dim_listings", "dim_listing_id_map", "dim_hosts",
                     "dim_dates", "fact_calendar", "fact_reviews"):
            df = getattr(tables, name)
            writer = df.write.mode("overwrite")
            spec = part_col.get(name)
            if spec is not None and spec[0] in df.columns:
                src, _ = spec
                df = df.withColumn("part_month",
                                   F.date_format(F.col(src), "yyyy-MM"))
                writer = df.write.mode("overwrite").partitionBy("part_month")
            writer.parquet(os.path.join(output_dir, name))
            tables.stats[name] = spark.read.parquet(
                os.path.join(output_dir, name)).count()
    return tables
