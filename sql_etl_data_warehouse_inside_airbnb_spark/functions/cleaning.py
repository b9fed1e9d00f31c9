"""Cleaning / normalization expressions.

Re-expresses the reference's row-wise sanitizers as vectorized Column
expressions so they run inside whole-stage codegen instead of a Python
loop:

- money cleanup      ← ``sql/data/04_load_calendar.sql:30-36`` (strip
  ``$`` ``,`` CHAR(13), TRY_CAST DECIMAL(10,2))
- numeric-string fix ← ``modules/data_loader.py:153-166`` (``123.0`` →
  ``123``, strip separators)
- boolean ladder     ← three truthy sets in the reference
  (``04_load_calendar.sql:38``, ``modules/data_validator.py:21``,
  ``modules/data_loader.py:168-174``) unified behind one parameterized
  normalizer (SURVEY §7.3).
- NVARCHAR(n) truncation ← client-side truncation at
  ``modules/data_loader.py:147-151,435-436`` — a *semantic*, kept as
  explicit ``substring``.
- host_location parse ← ``modules/data_cleaner.py:48-65`` comma-split
  heuristic, as a pure column expression (no UDF).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

# truthy sets observed in the reference (SURVEY §7.3 "boolean ladder")
TRUTHY_SQL = ("t", "true", "1")                      # 04_load_calendar.sql:38
TRUTHY_LOADER = ("true", "1", "t", "y", "yes")       # data_loader.py:172


def clean_money(col: Column | str) -> Column:
    """``$1,234.00\r`` → DECIMAL(10,2) 1234.00; unparsable → NULL.

    Mirrors AVG(TRY_CAST(REPLACE(REPLACE(LTRIM(RTRIM(REPLACE(price,
    CHAR(13),''))),'$',''),',','') AS DECIMAL(10,2))) from
    04_load_calendar.sql:30-36.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.trim(c), r"[$,\r]", "")
    return F.nullif(stripped, F.lit("")).try_cast("decimal(10,2)")


def sanitize_numstr(col: Column | str) -> Column:
    """Strip a trailing ``.0`` float suffix and surrounding whitespace
    from an integer-ish string (data_loader.py:153-160), keep NULL for
    empty. The reference strips with python ``str.strip()`` — ALL
    whitespace, not just spaces — so ``F.trim`` (space-only, the T-SQL
    LTRIM/RTRIM twin) is wrong here: a trailing CR from a CRLF CSV row
    must not survive (found by tests/test_properties.py)."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(F.regexp_replace(c, r"^\s+|\s+$", ""),
                         r"\.0+$", "")
    return F.nullif(s, F.lit(""))


def norm_bool(col: Column | str, truthy: tuple[str, ...] = TRUTHY_LOADER,
              null_as: bool | None = False) -> Column:
    """Parameterized boolean normalizer for the reference's three truthy
    ladders. ``null_as`` mirrors the validator's ``fillna(0)``
    (data_validator.py:21): NULL → False by default; pass ``None`` to
    keep NULL."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.trim(c))
    out = F.when(norm.isin(*truthy), F.lit(True)).otherwise(F.lit(False))
    if null_as is None:
        return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(out)
    return F.when(c.isNull(), F.lit(bool(null_as))).otherwise(out)


def truncate_str(col: Column | str, n: int) -> Column:
    """NVARCHAR(n) truncation semantics (data_loader.py:147-151)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def parse_host_location(col: Column | str) -> tuple[Column, Column]:
    """``"City, Region, Country"`` → (city=``"City, Region"``,
    country=``"Country"``); one part → (Unknown, part); empty/NULL →
    (Unknown, Unknown). Pure-column re-expression of
    data_cleaner.py:48-65 (returns (city, country) columns)."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    parts = F.split(trimmed, r"\s*,\s*")
    n = F.size(parts)
    country = F.element_at(parts, -1)
    city = F.array_join(F.slice(parts, 1, (n - F.lit(1)).cast("int")), ", ")
    empty = c.isNull() | (trimmed == "")
    return (
        F.when(empty | (n <= 1), F.lit("Unknown")).otherwise(city).alias("host_city"),
        F.when(empty, F.lit("Unknown")).otherwise(country).alias("host_country"),
    )


def geography_from_filename(path_col: Column | str) -> tuple[Column, Column]:
    """Parse ``{Country}_{City}_listings_{date}.csv.gz`` basenames
    (data_cleaner.py:24-46). Use with ``F.input_file_name()``."""
    c = F.col(path_col) if isinstance(path_col, str) else path_col
    base = F.element_at(F.split(c, "/"), -1)
    country = F.regexp_extract(base, r"^([^_]+)_", 1)
    city = F.regexp_extract(base, r"^[^_]+_([^_]+)_", 1)
    return (
        F.when(city == "", "Unknown").otherwise(city).alias("property_city"),
        F.when(country == "", "Unknown").otherwise(country).alias("property_country"),
    )


@pandas_udf(StructType([StructField("city", StringType()),
                        StructField("country", StringType())]))
def parse_host_location_udf(loc: pd.Series) -> pd.DataFrame:
    """Arrow-batched pandas-UDF variant of ``parse_host_location`` —
    the UDF-surface demo SURVEY §2.10 U1 calls for. Semantics match the
    column-expression version exactly (parity-tested); prefer the
    column version in hot paths (JVM-side, codegen-able)."""
    def _parse(s):
        if s is None or not str(s).strip():
            return ("Unknown", "Unknown")
        parts = [p.strip() for p in re.split(r"\s*,\s*", str(s).strip())]
        if len(parts) <= 1:
            return ("Unknown", parts[-1])
        return (", ".join(parts[:-1]), parts[-1])
    parsed = loc.map(_parse)
    return pd.DataFrame({"city": parsed.map(lambda t: t[0]),
                         "country": parsed.map(lambda t: t[1])})
