"""Driver-checkable IO-mechanics probes (SURVEY §2.1 S-rows).

The S-row sinks/scans (quarantine split S8, pipe-gzip CSV sink S9 /
scan S3, generic export S10, compaction S11) were pytest-only through
round 2 — the driver's correctness gate never saw them because a
registry query must return a DataFrame an ANSI-SQL oracle can
reproduce. These probes close that gap with a write → read-back →
aggregate shape: the query materializes data through the real sink and
scan, then returns per-branch counts and value checksums. The oracle
computes the same aggregates directly from the source table, so the
hashes match **iff the round trip preserved every row and byte** —
turning the sink/scan mechanics themselves into the thing under test.

Reference parity: the quarantine split replaces the reference's per-row
INSERT fallback writing logs/listings_skipped_rows.csv
(modules/data_loader.py:203-228); the pipe-gzip sink/scan is the
cleaned layer (modules/data_cleaner.py:146, data_loader.py:133).

Scale note: the probe writes are tiny on purpose, but the code paths
are the production ones — distributed CSV part-files with per-file
headers, gzip codec, schema-on-read with no inference (all-string),
and a rename-atomic compaction rewrite.
"""

from __future__ import annotations

import hashlib
import os
import re

from pyspark.sql import functions as F

from sql_etl_data_warehouse_inside_airbnb_spark.plans.registry import (
    register,
    t,
)
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
    compact_parquet,
    read_format,
    read_pipe_csv,
    split_quarantine,
    write_format,
    write_pipe_csv,
)

_TMP = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".tmp_probe")


def _sf_token(sf_dir: str) -> str:
    """Identifier-safe token derived from sf_dir — usable both as a
    path segment and inside a catalog table name (dots in 'sf0.01'
    would need backticks as an identifier). The readable basename is
    suffixed with a short hash of the FULL normalized path: two
    distinct dirs whose basenames collide (.../genA/sf0.1 vs
    .../genB/sf0.1, or 'sf0.1' vs 'sf0_1' after sanitizing) must not
    share a token, or the cross-scale clobber this helper exists to
    prevent comes right back (post-round review)."""
    full = os.path.normpath(os.path.abspath(sf_dir))
    base = re.sub(r"[^A-Za-z0-9_]", "_",
                  os.path.basename(full) or "sf")
    # usedforsecurity=False: this is a path-disambiguation fingerprint,
    # not a security hash — and plain md5() raises on FIPS-enforcing
    # Python builds (r11 advisor note)
    return (f"{base}_"
            f"{hashlib.md5(full.encode(), usedforsecurity=False).hexdigest()[:6]}")


def _probe_dir(sf_dir: str, name: str) -> str:
    """Probe scratch path scoped by SCALE FACTOR (r10 advisor): the
    roundtrip probes write to fixed paths, so building one entry at a
    second sf in the same process used to overwrite the first sf's
    files — and the lazily-evaluated DataFrame returned for the first
    build would then read the other scale's data. A token derived
    from sf_dir (its basename) keeps each scale's probe files
    disjoint."""
    return os.path.join(_TMP, _sf_token(sf_dir), name)


@register(
    "s8_quarantine_roundtrip",
    """WITH raw AS (
         SELECT CASE WHEN o_orderkey % 97 = 0
                     THEN 'X' || CAST(o_orderkey AS VARCHAR)
                     ELSE CAST(o_orderkey AS VARCHAR) END AS o_orderkey,
                CAST(o_custkey AS VARCHAR) AS o_custkey
         FROM orders)
       SELECT 'good' AS branch,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(TRY_CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
              CAST(sum(length(o_orderkey) + length(o_custkey)) AS BIGINT)
                  AS byte_sum
       FROM raw WHERE TRY_CAST(o_orderkey AS BIGINT) IS NOT NULL
       UNION ALL
       SELECT 'reject' AS branch,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(TRY_CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
              CAST(sum(length(o_orderkey) + length(o_custkey)) AS BIGINT)
                  AS byte_sum
       FROM raw WHERE TRY_CAST(o_orderkey AS BIGINT) IS NULL""",
    survey="S8/S9/S3",
    note="reject-file semantics probe: corrupt ~1% of keys "
         "deterministically, split_quarantine (S8, the declarative "
         "reject csv of data_loader.py:203-228), write BOTH branches "
         "through the pipe-gzip CSV sink (S9), read them back with the "
         "no-inference pipe scan (S3), and aggregate. The oracle "
         "derives the same counts/sums straight from orders, so a "
         "green hash certifies the sink+scan round trip byte-for-byte. "
         "reject's key_sum is NULL by construction (no key casts) — "
         "that NULL surviving the round trip is part of the check")
def s8_quarantine_roundtrip(spark, sf_dir):
    raw = (t(spark, sf_dir, "orders")
           .select(F.when(F.col("o_orderkey") % 97 == 0,
                          F.concat(F.lit("X"),
                                   F.col("o_orderkey").cast("string")))
                    .otherwise(F.col("o_orderkey").cast("string"))
                    .alias("o_orderkey"),
                   F.col("o_custkey").cast("string").alias("o_custkey")))
    good, reject = split_quarantine(raw, "o_orderkey", "bigint")
    cols = ["o_orderkey", "o_custkey"]
    base = _probe_dir(sf_dir, "s8_quarantine")
    write_pipe_csv(good, os.path.join(base, "good"))
    write_pipe_csv(reject, os.path.join(base, "reject"))

    def summarize(branch):
        rt = read_pipe_csv(spark, os.path.join(base, branch), columns=cols)
        return (rt.agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_orderkey").try_cast("bigint")).alias("key_sum"),
            F.sum(F.length("o_orderkey") + F.length("o_custkey"))
             .cast("bigint").alias("byte_sum"))
            .select(F.lit(branch).alias("branch"), "n_rows", "key_sum",
                    "byte_sum"))

    return summarize("good").unionByName(summarize("reject"))


@register(
    "s5_header_scan",
    """SELECT CAST(ordinal_position AS BIGINT) AS pos, column_name
       FROM information_schema.columns
       WHERE table_name = 'supplier'""",
    survey="S5/S9/S3",
    note="header-only scan probe (the reference's nrows=0 column "
         "discovery, modules/data_cleaner.py:213): write supplier "
         "through the pipe-gzip sink, then scan ONLY the header "
         "(header=True read with no schema and no inference resolves "
         "columns from the first line; limit(0) keeps the job "
         "data-free) and return the (position, name) listing. The "
         "oracle reads the same listing from information_schema, so a "
         "green hash certifies the sink wrote the header and the scan "
         "recovered names in order. The createDataFrame is "
         "driver-side by design — a column LISTING is O(schema), "
         "never O(data)")
def s5_header_scan(spark, sf_dir):
    sup = t(spark, sf_dir, "supplier")
    path = os.path.join(_probe_dir(sf_dir, "s5_header"), "supplier")
    write_pipe_csv(sup, path)
    header = read_pipe_csv(spark, path)   # no schema: columns from header
    # .columns reads the analyzed schema — never a data job
    listed = header.columns
    return spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(listed)],
        "pos bigint, column_name string")


@register(
    "s11_compaction_roundtrip",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_keys,
              CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
              CAST(sum(length(s_name)) AS BIGINT) AS name_chars
       FROM supplier""",
    survey="S10/S11",
    note="table-lifecycle probe: export supplier to a parquet dir "
         "fragmented into 16 small files (S10), run the rename-atomic "
         "compact_parquet maintenance rewrite (S11, the small-files "
         "compaction SCALE.md documents), read the compacted table "
         "back and checksum it against the oracle's direct scan. "
         "Asserts compaction changed the file layout, not the data — "
         "and that the rewrite actually compacted (files_after < "
         "files_before)")
def s11_compaction_roundtrip(spark, sf_dir):
    path = os.path.join(_probe_dir(sf_dir, "s11_compact"), "supplier")
    (t(spark, sf_dir, "supplier")
     .select("s_suppkey", "s_name")
     .repartition(16)
     .write.mode("overwrite").parquet(path))
    stats = compact_parquet(spark, path, target_file_mb=128)
    if stats["files_after"] >= stats["files_before"]:
        # not assert: python -O would compile the layout check away
        # and a compaction regression would pass on data checksums
        raise RuntimeError(f"compaction did not reduce files: {stats}")
    rt = spark.read.parquet(path)
    return rt.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("s_suppkey").alias("n_keys"),
        F.sum("s_suppkey").alias("key_sum"),
        F.sum(F.length("s_name")).cast("bigint").alias("name_chars"))


@register(
    "s10_partition_prune_roundtrip",
    """SELECT o_orderpriority,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(o_orderkey) AS BIGINT) AS key_sum
       FROM orders
       WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
       GROUP BY o_orderpriority""",
    survey="S10/S11 (partitioned layout)",
    note="hive-partitioned sink round trip: write orders partitioned "
         "by o_orderpriority (sources/io.py:write_format partition_by "
         "— the layout where the partition column IS the primary "
         "index, SCALE.md), read back with an IN filter that must "
         "prune to 2 of 5 directories BEFORE any IO, and checksum the "
         "surviving partitions against the oracle's direct filter. "
         "The partition column round-trips through the directory NAME "
         "(col=value paths), not the data files — so a green hash "
         "also certifies hive-style path encode/decode. Pruning "
         "itself is plan-asserted in tests/test_plans.py-style via "
         "the partition filters shown in explain; this probe pins the "
         "VALUES surviving the layout")
def s10_partition_prune_roundtrip(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        read_format,
        write_format,
    )
    path = os.path.join(_probe_dir(sf_dir, "s10_partitioned"), "orders")
    write_format(
        t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        path, partition_by=["o_orderpriority"])
    rt = read_format(spark, path)
    return (rt.filter(F.col("o_orderpriority")
                      .isin("1-URGENT", "2-HIGH"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("o_orderkey").alias("key_sum")))


@register(
    "s13_schema_evolution_roundtrip",
    """WITH old_batch AS (
         SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE) AS s_acctbal
         FROM supplier WHERE s_suppkey % 2 = 0),
       new_batch AS (
         SELECT s_suppkey, s_name, s_acctbal
         FROM supplier WHERE s_suppkey % 2 = 1),
       merged AS (SELECT * FROM old_batch UNION ALL
                  SELECT * FROM new_batch)
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
              CAST(count(s_acctbal) AS BIGINT) AS n_with_acctbal,
              round(CAST(sum(CAST(s_acctbal AS DECIMAL(18,6)))
                         AS DOUBLE), 2) AS acctbal_sum
       FROM merged""",
    survey="S10 ext (schema evolution on read)",
    note="schema-drift round trip: an OLD batch written without the "
         "s_acctbal column and a NEW batch with it land in the same "
         "directory (the real life of any long-lived ingest layout); "
         "reading with mergeSchema=true must union the schemas and "
         "null-fill the old files. The aggregate pins row "
         "conservation, key checksum, and that EXACTLY the new "
         "batch's rows carry the evolved column — a reader that "
         "dropped old files, defaulted the column to 0, or picked one "
         "file's schema breaks the hash. At 100 TB, mergeSchema=true "
         "on every read is a footer-scan tax — evolve the TABLE "
         "schema (Delta/Iceberg metadata) and keep per-read merging "
         "for backfill audits like this probe")
def s13_schema_evolution_roundtrip(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        read_format,
        write_format,
    )
    path = os.path.join(_probe_dir(sf_dir, "s13_evolution"), "supplier")
    supp = t(spark, sf_dir, "supplier")
    write_format(supp.filter(F.col("s_suppkey") % 2 == 0)
                 .select("s_suppkey", "s_name"), path)
    write_format(supp.filter(F.col("s_suppkey") % 2 == 1)
                 .select("s_suppkey", "s_name", "s_acctbal"),
                 path, mode="append")
    rt = read_format(spark, path, mergeSchema="true")
    return rt.agg(
        F.count("*").alias("n_rows"),
        F.sum("s_suppkey").alias("key_sum"),
        F.count("s_acctbal").alias("n_with_acctbal"),
        F.round(F.sum(F.col("s_acctbal").cast("decimal(18,6)"))
                .cast("double"), 2).alias("acctbal_sum"))


@register(
    "s14_bucketed_join_roundtrip",
    """SELECT o_orderpriority,
              CAST(count(*) AS BIGINT) AS n_items,
              CAST(sum(l_orderkey) AS BIGINT) AS key_sum
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority""",
    survey="S11 ext (bucketed catalog tables, co-located join)",
    note="bucketed-layout round trip: lineitem and orders persist as "
         "catalog tables bucketed 8-ways on the join key "
         "(sources/io.py:write_bucketed), then join WITHOUT a shuffle "
         "exchange — the fact-x-fact lever when neither side "
         "broadcasts at 100 TB. The no-Exchange property is plan-"
         "asserted in tests/test_bucketing.py; this probe pins the "
         "VALUES surviving the bucketed write+catalog read against "
         "the oracle's direct join, so a bucketing bug that drops or "
         "duplicates rows (the classic hash-mismatch failure) breaks "
         "the hash. Tables are overwritten per build — idempotent "
         "under the driver's repeated runs")
def s14_bucketed_join_roundtrip(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        write_bucketed,
    )

    # overwrite_location reclaims orphaned warehouse dirs left by a
    # previous session, so the probe is idempotent across the
    # driver's one-session-per-round runs (cleanup lives with
    # write_bucketed, which owns the saveAsTable contract)
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    # explicit ABSOLUTE locations: the default warehouse dir resolves
    # against the HOST PROCESS's cwd (the correctness driver's, not
    # this repo's), which the probe neither controls nor knows to be
    # writable
    # table NAMES carry the sf token too: the catalog is process-wide,
    # so a fixed name would repoint the table when a second scale
    # factor builds in the same session — the same staleness the
    # _probe_dir path scoping removes (r10 advisor)
    tok = _sf_token(sf_dir)
    tli, tord = f"s14_b_lineitem_{tok}", f"s14_b_orders_{tok}"
    write_bucketed(li, tli, ["l_orderkey"], n_buckets=8,
                   sort_cols=["l_orderkey"], overwrite_location=True,
                   location=_probe_dir(sf_dir, "s14_b_lineitem"))
    write_bucketed(o, tord, ["o_orderkey"], n_buckets=8,
                   sort_cols=["o_orderkey"], overwrite_location=True,
                   location=_probe_dir(sf_dir, "s14_b_orders"))
    joined = spark.table(tli).join(
        spark.table(tord),
        F.col("l_orderkey") == F.col("o_orderkey"))
    return (joined.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_items"),
                 F.sum("l_orderkey").alias("key_sum")))


def _morton16(a, b):
    """Interleave the low 16 bits of two integer columns (Morton /
    Z-order code) with pure column arithmetic — bit i of ``a`` lands
    at position 2i, bit i of ``b`` at 2i+1."""
    code = F.lit(0).cast("bigint")
    for i in range(16):
        abit = F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1))
        code = (code
                + abit * F.lit(1 << (2 * i)).cast("bigint")
                + bbit * F.lit(1 << (2 * i + 1)).cast("bigint"))
    return code


@register(
    "s15_zorder_layout_roundtrip",
    """WITH coded AS (
         SELECT l_partkey, l_suppkey, l_orderkey,
                (SELECT sum(
                     ((l_partkey  // (1 << i.i)) % 2) * (1 << (2 * i.i))
                   + ((l_suppkey // (1 << i.i)) % 2) * (1 << (2 * i.i + 1)))
                 FROM range(0, 16) AS i(i)) AS z
         FROM lineitem)
       SELECT CAST(count(*) AS BIGINT) AS n_box,
              CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
              CAST(min(z) AS BIGINT) AS z_min,
              CAST(max(z) AS BIGINT) AS z_max
       FROM coded
       WHERE l_partkey BETWEEN 100 AND 150
         AND l_suppkey BETWEEN 10 AND 40""",
    survey="S10/S11 ext (Z-order multi-dimensional layout)",
    note="Z-order (Morton) clustering probe: the bit-interleaved code "
         "of (partkey, suppkey) is computed in pure integer column "
         "arithmetic, the table is written SORTED by it, and a "
         "two-dimensional box filter reads back through the layout "
         "with its checksum pinned against the oracle (which "
         "recomputes the interleave independently via range()-sum "
         "arithmetic). At 100 TB sorting files by the Z-code makes "
         "row-group min/max stats selective on BOTH dimensions at "
         "once — a single-column sort layout prunes only its own "
         "column, the standard reason engines Z-order their facts. "
         "The probe's plan is scan -> filter -> agg; the layout's "
         "pruning effect shows in row-group stats, not the plan shape")
def s15_zorder_layout_roundtrip(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        read_format,
        write_format,
    )
    path = os.path.join(_probe_dir(sf_dir, "s15_zorder"), "lineitem")
    li = (t(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey", "l_orderkey")
          .withColumn("z", _morton16(F.col("l_partkey"),
                                     F.col("l_suppkey"))))
    write_format(li.repartitionByRange(8, "z").sortWithinPartitions("z"),
                 path)
    rt = read_format(spark, path)
    return (rt.filter(F.col("l_partkey").between(100, 150)
                      & F.col("l_suppkey").between(10, 40))
            .agg(F.count("*").alias("n_box"),
                 F.sum("l_orderkey").alias("key_sum"),
                 F.min("z").alias("z_min"),
                 F.max("z").alias("z_max")))


@register(
    "j22_dynamic_partition_prune",
    """WITH dim AS (
         SELECT r_regionkey,
                (['1-URGENT', '2-HIGH', '3-MEDIUM',
                  '4-NOT SPECIFIED', '5-LOW'])[r_regionkey + 1]
                    AS priority
         FROM region WHERE r_name IN ('ASIA', 'EUROPE'))
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
              CAST(count(DISTINCT o_orderpriority) AS BIGINT)
                  AS n_priorities
       FROM orders JOIN dim ON o_orderpriority = dim.priority""",
    survey="J1/P7 ext (dynamic partition pruning)",
    note="runtime partition pruning probe: orders is written "
         "partitioned by o_orderpriority, and the pruning predicate "
         "is NOT a literal — it comes from a dimension table filtered "
         "at runtime (region -> priority mapping, 2 of 5 survive), "
         "exactly the star-join case static pruning can't touch. "
         "Catalyst plants a DynamicPruningExpression subquery on the "
         "fact's partition column, so only the dim's surviving "
         "partitions are read (plan-asserted in tests/test_plans.py); "
         "the checksum pins the surviving VALUES against the oracle's "
         "direct join. At 100 TB this is the difference between "
         "scanning 2 partitions and scanning the table whenever the "
         "filter lives on the dim side")
def j22_dynamic_partition_prune(spark, sf_dir):
    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        read_format,
        write_format,
    )
    path = os.path.join(_probe_dir(sf_dir, "j22_dpp"), "orders")
    write_format(
        t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        path, partition_by=["o_orderpriority"])
    fact = read_format(spark, path)
    prios = F.array(*[F.lit(p) for p in
                      ("1-URGENT", "2-HIGH", "3-MEDIUM",
                       "4-NOT SPECIFIED", "5-LOW")])
    dim = (t(spark, sf_dir, "region")
           .filter(F.col("r_name").isin("ASIA", "EUROPE"))
           .select(F.element_at(prios, F.col("r_regionkey") + 1)
                   .alias("priority")))
    return (fact.join(dim, fact.o_orderpriority == dim.priority)
            .agg(F.count("*").alias("n_rows"),
                 F.sum("o_orderkey").alias("key_sum"),
                 F.countDistinct("o_orderpriority").alias("n_priorities")))


@register(
    "s16_multiline_csv_roundtrip",
    """WITH g AS (
         SELECT s_suppkey,
                s_name || chr(10) || '"quo|ted"' || chr(10) || 'end\\'
                    AS gnarly
         FROM supplier)
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
              CAST(sum(length(gnarly)) AS BIGINT) AS char_sum,
              CAST(sum(length(gnarly)
                       - length(replace(gnarly, chr(10), ''))) AS BIGINT)
                  AS nl_sum
       FROM g""",
    survey="S9/S3 ext (RFC-4180 quoting)",
    note="multiline/quoted-field roundtrip probe: every supplier name "
         "gets a suffix containing embedded newlines, the pipe "
         "delimiter, double quotes, and a trailing backslash, goes "
         "through the pipe-gzip sink and the multiLine no-inference "
         "scan, and is checksummed (row count, key sum, char count, "
         "newline count). Real Inside-Airbnb reviews contain all four "
         "hazards; this probe is what caught the writer default "
         "(backslash escaping) disagreeing with the RFC-style reader "
         "— a mismatch shears rows, so a green hash certifies "
         "sink+scan agree byte-for-byte on the full quoting grammar")
def s16_multiline_csv_roundtrip(spark, sf_dir):
    gnarly = F.concat(F.col("s_name"), F.lit('\n"quo|ted"\nend\\'))
    raw = (t(spark, sf_dir, "supplier")
           .select(F.col("s_suppkey").cast("string").alias("s_suppkey"),
                   gnarly.alias("gnarly")))
    base = _probe_dir(sf_dir, "s16_multiline")
    write_pipe_csv(raw, base)
    rt = read_pipe_csv(spark, base, columns=["s_suppkey", "gnarly"])
    nl = F.length("gnarly") - F.length(F.regexp_replace("gnarly", "\n", ""))
    return rt.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("s_suppkey").try_cast("bigint")).alias("key_sum"),
        F.sum(F.length("gnarly")).cast("bigint").alias("char_sum"),
        F.sum(nl).cast("bigint").alias("nl_sum"))


@register(
    "s17_key_erasure_roundtrip",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_keys,
              CAST(sum(o_custkey) AS BIGINT) AS key_sum,
              round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                         AS DOUBLE), 2) AS price_sum,
              CAST(0 AS BIGINT) AS n_leaked
       FROM orders WHERE o_custkey >= 100""",
    survey="§2.1 ext (key-scoped deletion / right-to-be-forgotten)",
    note="GDPR-erasure probe: write orders partitioned by a custkey "
         "bucket (key div 100 — erasure locality BY LAYOUT), erase "
         "one tenant's keys (o_custkey < 100) with "
         "sources/io.py:erase_keys — broadcast anti join, "
         "partition-pruned rename-atomic rewrite — then read the "
         "table back and checksum the survivors against the oracle's "
         "direct filter. The probe additionally raises unless (a) "
         "EXACTLY the one affected partition was rewritten and (b) "
         "every untouched partition's files are byte-identical "
         "(name+size+mtime) — deletion must not churn data it "
         "doesn't touch. n_leaked counts erased keys still present "
         "post-rewrite; the oracle pins it to literal 0")
def s17_key_erasure_roundtrip(spark, sf_dir):
    import shutil

    from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (
        erase_keys,
    )

    path = os.path.join(_probe_dir(sf_dir, "s17_erasure"), "orders")
    if os.path.isdir(path):
        shutil.rmtree(path)
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        (F.col("o_custkey") - F.pmod("o_custkey", F.lit(100)))
        .alias("cust_bucket"))
    # r13: cluster by the partition column before the partitioned
    # write (guide §6 — the REBALANCE-before-write pattern): the
    # single-row-group scan otherwise writes all ~150 bucket dirs
    # through ONE task's dynamic-partition writer, serially; the
    # repartition spreads buckets across the session cores and keeps
    # exactly one file per partition (same layout contract the probe
    # checks). r14: the partition count is PINNED to the session's
    # core count — the by-column form is AQE-coalescible and the
    # few-MB shuffle collapsed back to 2 tasks (measured via
    # rdd.getNumPartitions), re-serializing ~75 bucket dirs per
    # writer; REPARTITION_BY_NUM is not coalesced, each bucket value
    # still lands wholly in one task (one file per partition), and
    # defaultParallelism keeps it scale-adaptive, not a local tune.
    ncores = spark.sparkContext.defaultParallelism
    (orders.repartition(ncores, "cust_bucket")
     .write.mode("overwrite").partitionBy("cust_bucket").parquet(path))

    def _layout(p):
        out = {}
        for root, _dirs, names in os.walk(p):
            for n in names:
                if n.endswith(".parquet"):
                    fp = os.path.join(root, n)
                    st = os.stat(fp)
                    out[os.path.relpath(fp, p)] = (st.st_size, st.st_mtime_ns)
        return out

    before = _layout(path)
    tenant = (t(spark, sf_dir, "orders")
              .filter(F.col("o_custkey") < 100)
              .select("o_custkey").distinct())
    stats = erase_keys(spark, path, "o_custkey", tenant,
                       partition_cols=["cust_bucket"])
    # not assert: python -O would compile these away and a pruning
    # regression would pass on data checksums alone
    if stats["partitions_rewritten"] != 1:
        raise RuntimeError(f"expected 1 rewritten partition: {stats}")
    after = _layout(path)
    untouched_before = {k: v for k, v in before.items()
                        if not k.startswith("cust_bucket=0/")}
    untouched_after = {k: v for k, v in after.items()
                       if not k.startswith("cust_bucket=0/")}
    if untouched_before != untouched_after:
        raise RuntimeError("erasure churned untouched partitions")

    rt = spark.read.parquet(path)
    return rt.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_keys"),
        F.sum("o_custkey").cast("bigint").alias("key_sum"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
                .cast("double"), 2).alias("price_sum"),
        F.sum((F.col("o_custkey") < 100).cast("bigint"))
        .cast("bigint").alias("n_leaked"))


@register(
    "s18_jsonl_roundtrip",
    """WITH g AS (
         SELECT doc_id,
                text || '"' || chr(10) || 'café ✓ \\' AS gnarly,
                lang
         FROM documents)
       SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(doc_id) AS BIGINT) AS id_sum,
              CAST(sum(length(gnarly)) AS BIGINT) AS char_sum,
              CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
       FROM g""",
    survey="S9/S3 ext (JSONL source/sink — the LLM-corpus format)",
    note="gzip JSON-Lines roundtrip probe: every document's text gets "
         "a suffix with an embedded double quote, a newline, a "
         "non-ASCII char and a trailing backslash (the four JSON "
         "escaping hazards), goes through write_format(json, gzip) "
         "and a SCHEMA'D read_format(json) back (inference is an "
         "extra full pass and widens types — sources/io.py "
         "read_format docstring), then is checksummed. JSONL is the "
         "interchange format every LLM corpus ships in (one JSON "
         "object per line, splittable when gzip-chunked at the file "
         "level); the green hash certifies the sink escapes and the "
         "scan unescapes byte-identically, incl. the newline INSIDE "
         "a string (the classic naive-line-splitter breaker — "
         "Spark's JSON reader handles it because escaping makes the "
         "physical line atomic). char counts are code points on both "
         "engines, so the unicode char counts 1")
def s18_jsonl_roundtrip(spark, sf_dir):
    raw = (t(spark, sf_dir, "documents")
           .select("doc_id",
                   F.concat(F.col("text"),
                            F.lit('"\ncafé ✓ \\')).alias("gnarly"),
                   "lang"))
    base = _probe_dir(sf_dir, "s18_jsonl")
    write_format(raw, base, fmt="json", compression="gzip")
    rt = read_format(spark, base, fmt="json",
                     schema="doc_id bigint, gnarly string, lang string")
    return rt.agg(
        F.count("*").alias("n_rows"),
        F.sum("doc_id").alias("id_sum"),
        F.sum(F.length("gnarly")).cast("bigint").alias("char_sum"),
        F.countDistinct("lang").alias("n_langs"))


@register(
    "s19_orc_roundtrip",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
              CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
              CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_flags
       FROM lineitem
       WHERE l_quantity > 25""",
    survey="S9/S3 ext (ORC source/sink — the other columnar format)",
    note="ORC roundtrip probe (the s18 JSONL pattern on the columnar "
         "axis): lineitem's key/quantity/flag projection goes "
         "through write_format(orc, zlib) and a SCHEMA'D "
         "read_format(orc) back with a quantity filter, then is "
         "checksummed; the oracle computes the same aggregates "
         "straight from the parquet source, so a green hash "
         "certifies the ORC sink+scan round trip value-exactly AND "
         "that the filter applied on the read-back path (the "
         "predicate reaches the ORC scan as a pushed filter — "
         "pinned in tests/test_r10.py; a migration user's existing "
         "ORC warehouse reads through the same two calls). "
         "l_quantity is integer-valued by generation, so the BIGINT "
         "cast sum is exact on both engines",
    tags=())
def s19_orc_roundtrip(spark, sf_dir):
    li = (t(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_returnflag"))
    base = _probe_dir(sf_dir, "s19_orc")
    write_format(li, base, fmt="orc", compression="zlib")
    rt = read_format(
        spark, base, fmt="orc",
        schema="l_orderkey bigint, l_quantity double, "
               "l_returnflag string")
    return (rt.filter(F.col("l_quantity") > 25)
            .agg(F.count("*").alias("n_rows"),
                 F.sum("l_orderkey").alias("key_sum"),
                 F.sum(F.col("l_quantity").cast("bigint"))
                 .alias("qty_sum"),
                 F.countDistinct("l_returnflag").alias("n_flags")))
