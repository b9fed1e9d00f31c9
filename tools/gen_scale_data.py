"""Generate a larger scale factor locally by shard-replicating the
driver's sf0.1 tables (r12 verdict item 5: buy one empirical scale
data point for the headline suite instead of resting the 100x claims
on plan shape alone).

Method: K disjoint "shards" — copy i of every table gets its BIGINT
keys offset by i * (max_key + 1) per referenced table, so foreign
keys stay aligned WITHIN a shard and never join ACROSS shards. That
preserves per-key fanout, group cardinalities per shard, and join
selectivity exactly, while rows, distinct keys, and shuffle volume
scale by K — the cleanest way to measure how a plan's cost grows
with data, because any super-linear growth is then the operator's,
not an artifact of cross-copy key collisions.

Value-sensitive columns are decorrelated across shards so
similarity operators scale linearly by construction instead of
quadratically by duplication:

- documents.text: shard i > 0 suffixes every whitespace token with
  ``_c{i}`` — within-shard dup/near-dup structure is identical to
  shard 0, cross-shard shingle overlap is zero (n_chars recomputed);
- embeddings.embedding: shard i rotates the vector by i positions —
  within-shard geometry (all pairwise distances) is preserved,
  cross-shard cosines decorrelate;
- part.p_name: per-shard rot-N substitution cipher (r13 — p_name
  became a similarity column when ext_fuzzy_blocked_join was
  re-encoded to edit-distance matching; without decorrelation,
  TPC-H's fixed 92-color vocabulary makes cross-shard segment keys
  collide and the measured candidate growth is the replication's,
  not the operator's). A cipher, not a token suffix: it preserves
  lengths and all within-shard edit distances exactly;
- nation/region: fixed dimensions, copied once (as at every TPC-H
  scale factor).

Usage: python tools/gen_scale_data.py [K] [src_dir] [out_dir]
       (default: 5 /root/testdata/sf0.1 .tmp_scale/sf0.5)
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# BIGINT key columns per table; FK columns reference another table's
# offset so shards stay internally consistent
KEYED = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    # events.user_id is an FK into customer.c_custkey (the enrich
    # joins pair them), and embeddings.vec_id pairs 1:1 with
    # documents.doc_id (the training-manifest join) — both must use
    # the REFERENCED table's stride or shard-i rows join shard-0's
    # dimension rows, violating the within-shard invariant
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "documents"},
}
COPY_ONLY = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (sys.argv[3] if len(sys.argv) > 3
           else os.path.join(REPO, ".tmp_scale", "sf0.5"))
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    # per-offset-domain stride = max existing key + 1 (keys stay dense)
    stride: dict[str, int] = {}
    for tbl, keys in KEYED.items():
        for col, domain in keys.items():
            mx = con.execute(
                f"SELECT MAX({col}) FROM '{src}/{tbl}.parquet'"
            ).fetchone()[0]
            stride[domain] = max(stride.get(domain, 0), int(mx) + 1)

    for tbl in COPY_ONLY:
        con.execute(f"COPY (SELECT * FROM '{src}/{tbl}.parquet') "
                    f"TO '{out}/{tbl}.parquet' (FORMAT PARQUET)")
        print(f"{tbl}: copied")

    for tbl, keys in KEYED.items():
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{tbl}.parquet'").fetchall()]
        selects = []
        for i in range(k):
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + {i * stride[keys[c]]} AS {c}")
                elif tbl == "documents" and c == "text" and i > 0:
                    exprs.append(
                        r"regexp_replace(text, '(\S+)', "
                        rf"'\1_c{i}', 'g') AS text")
                elif tbl == "documents" and c == "n_chars" and i > 0:
                    exprs.append(
                        r"CAST(length(regexp_replace(text, '(\S+)', "
                        rf"'\1_c{i}', 'g')) AS BIGINT) AS n_chars")
                elif tbl == "part" and c == "p_name" and i > 0:
                    # p_name is a similarity column since the r13
                    # ext_fuzzy_blocked_join re-encode (edit-distance
                    # matching). Decorrelate with a per-shard rot-N
                    # substitution cipher: injective char maps
                    # preserve string lengths and every within-shard
                    # edit distance EXACTLY (shard i is isomorphic to
                    # shard 0), so the fuzzy join's within-shard
                    # candidates and true matches replicate per shard
                    # (measured exactly 5x at K=5). Cross-shard
                    # segments CAN still collide where one substring
                    # happens to be the rot-(5(i-j)) image of another
                    # — measured 8.8% of candidates at K=5, every one
                    # rejected by the radius DP (true output exactly
                    # 5x) — so the linearity is measured, not
                    # guaranteed. (A token-suffix like documents.text
                    # would be worse: every token shares the suffix,
                    # inflating within-shard segment collisions ~2.6x
                    # and drifting lengths/distances.)
                    az = "abcdefghijklmnopqrstuvwxyz"
                    rot = az[5 * i % 26:] + az[:5 * i % 26]
                    exprs.append(
                        f"translate(p_name, '{az}', '{rot}') "
                        f"AS p_name")
                elif tbl == "embeddings" and c == "embedding" and i > 0:
                    # rotate by i: list_concat(tail, head) keeps the
                    # FLOAT[] element type and within-shard geometry
                    exprs.append(
                        f"CAST(list_concat(embedding[{i + 1}:], "
                        f"embedding[1:{i}]) AS FLOAT[]) AS embedding")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{src}/{tbl}.parquet'")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{out}/{tbl}.parquet' "
                    f"(FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM '{out}/{tbl}.parquet'").fetchone()[0]
        print(f"{tbl}: {n} rows ({k} shards)")


if __name__ == "__main__":
    main()
