"""Grid-blocked distance join — the spatial join as Spark-first
candidate-generation + exact re-check.

The reference's data model is geographic (listings carry
latitude/longitude, hosts a parsed location; sql/schema/
01_create_tables.sql, modules/enrich.py) but its only spatial
operation is grouping by the raw coordinate columns. A complete
engine needs the real thing: "pairs within distance R" without the
O(n·m) cross join. The standard shape is geohash/grid blocking:

- each point lands in ONE integer grid cell of side R;
- every candidate pair within distance R differs by at most one cell
  per axis, so exploding ONE side to its 3×3 cell neighborhood and
  equi-joining on the cell key yields every true pair exactly once
  (the un-exploded side keeps a single cell per point);
- the exact distance predicate then filters inside the join — never
  a nested-loop join over the full tables.

At 100 TB both sides shuffle once on the cell key; the 9× fan-out
rides the smaller side. Cell side = R keeps the neighborhood at 3×3;
halving the cell side (R/2 → 5×5 neighborhood) trades fan-out for
smaller cells when density is very skewed — same plan either way.
Distances here are exact integer squared-Euclidean (planar), which
keeps every compared value bit-deterministic; a haversine re-check is
a drop-in replacement for the final predicate when coordinates are
geodetic degrees (the blocking is unchanged — a degree cell is a
superset of the metric ball at any latitude away from the poles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_distance_join(left: DataFrame, right: DataFrame,
                       radius: int,
                       left_cols: tuple[str, str, str] = ("id", "x", "y"),
                       right_cols: tuple[str, str, str] = ("id", "x", "y"),
                       ) -> DataFrame:
    """All (left, right) pairs with squared Euclidean distance
    <= radius², via grid-cell blocking. Coordinates must be integral
    (or pre-scaled to integers — fixed-point beats float here: the
    predicate stays bit-exact). Returns (left_id, right_id, dist_sq).

    ``left`` is the exploded (9×) side — pass the smaller table
    first. One shuffle per side on the composite cell key.
    """
    if radius < 1:
        # radius 0 would put `div 0` in every cell key: ANSI mode
        # fails mid-job, non-ANSI silently returns ZERO pairs (NULL
        # cells never equi-join) — fail loudly at plan time instead
        raise ValueError(f"radius must be >= 1, got {radius}")
    lid, lx, ly = left_cols
    rid, rx, ry = right_cols

    def cell(c: str):
        # FLOOR division via the shared exact idiom (functions/
        # numeric.py): toward-zero `div` would land a negative
        # coordinate one cell too high and its pairs would silently
        # vanish; FLOOR(x/r) on doubles loses exactness past 2^53.
        from sql_etl_data_warehouse_inside_airbnb_spark.functions.numeric import (
            exact_floordiv_sql,
        )
        return F.expr(exact_floordiv_sql(f"CAST({c} AS BIGINT)", radius))

    neighbors = F.array(*[
        F.struct((cell(lx) + dx).alias("cx"), (cell(ly) + dy).alias("cy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    l_ = (left.select(F.col(lid).alias("__lid"),
                      F.col(lx).cast("bigint").alias("__lx"),
                      F.col(ly).cast("bigint").alias("__ly"),
                      F.explode(neighbors).alias("__cell"))
          .select("__lid", "__lx", "__ly",
                  F.col("__cell.cx").alias("__cx"),
                  F.col("__cell.cy").alias("__cy")))
    r_ = right.select(F.col(rid).alias("__rid"),
                      F.col(rx).cast("bigint").alias("__rx"),
                      F.col(ry).cast("bigint").alias("__ry"),
                      cell(rx).alias("__cx"), cell(ry).alias("__cy"))
    d2 = ((F.col("__lx") - F.col("__rx")) * (F.col("__lx") - F.col("__rx"))
          + (F.col("__ly") - F.col("__ry")) * (F.col("__ly") - F.col("__ry")))
    return (l_.join(r_, ["__cx", "__cy"])
            .filter(d2 <= radius * radius)
            .select(F.col("__lid").alias(f"left_{lid}"),
                    F.col("__rid").alias(f"right_{rid}"),
                    d2.alias("dist_sq")))
