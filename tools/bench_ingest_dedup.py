"""Measure the incremental-ingest dedup claim (SCALE.md): dedup cost
for a FIXED new batch should track the batch, not the corpus, when
the corpus side is a prebuilt MinHash index — vs re-running the batch
self-join over corpus+batch, which re-signs everything.

Corpus sizes sweep 1x/2x/4x/8x of the documents table (tiled with
shifted keys); the batch is fixed at ~10% of the base table, half of
it planted near-dups. Both paths produce the same pair semantics for
the batch docs.

Usage: python tools/bench_ingest_dedup.py [sf_dir]   (default sf0.1)
Prints one JSON line with per-scale {ingest_sec, selfjoin_sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sql_etl_data_warehouse_inside_airbnb_spark.operators.dedup import (  # noqa: E402
    minhash_banded_pairs,
    minhash_index,
    minhash_ingest_pairs,
)
from sql_etl_data_warehouse_inside_airbnb_spark.session import get_spark  # noqa: E402
from sql_etl_data_warehouse_inside_airbnb_spark.sources.io import (  # noqa: E402
    read_table,
)


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench_ingest")
    spark.sparkContext.setLogLevel("ERROR")
    base = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()

    # fixed batch: 10% of base, half planted near-dups of corpus docs
    batch = (base.filter(F.col("doc_id") % 20 == 0)
             .select((F.col("doc_id") + 900_000_000).alias("doc_id"),
                     F.concat("text", F.lit(" mutation")).alias("text"))
             .unionByName(
                 base.filter(F.col("doc_id") % 20 == 10)
                 .select((F.col("doc_id") + 910_000_000).alias("doc_id"),
                         F.concat("text", F.lit(" fresh ingest"))
                         .alias("text"))))

    out = {}
    for mult in (1, 2, 4, 8):
        corpus = None
        for i in range(mult):
            tile = base.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"), "text")
            corpus = tile if corpus is None else corpus.unionByName(tile)

        # the index is the PERSISTED corpus artifact — build it off
        # the clock (it amortizes over every future ingest), cache so
        # the timed run reads materialized state like a real index
        bands, sh = minhash_index(corpus)
        bands, sh = bands.persist(), sh.persist()
        materialize(bands), materialize(sh)

        t0 = time.perf_counter()
        materialize(minhash_ingest_pairs(batch, bands, sh))
        ingest = time.perf_counter() - t0

        t0 = time.perf_counter()
        materialize(minhash_banded_pairs(
            corpus.unionByName(batch), "doc_id", "text"))
        selfjoin = time.perf_counter() - t0

        bands.unpersist(), sh.unpersist()
        out[f"{mult}x"] = {"ingest_sec": round(ingest, 3),
                           "selfjoin_sec": round(selfjoin, 3)}
    print(json.dumps({"sf_dir": sf_dir, "base_docs": n_base,
                      "batch_frac": 0.1, "scales": out}))
    spark.stop()


if __name__ == "__main__":
    main()
