"""Distributed connected components — the clustering step of dedup.

The reference stops at pairwise duplicate detection (W1/W2 latest-per-
key, J4 anti-join re-load idempotency; SURVEY §2.3/§2.5). A training-
data pipeline needs one more step: near-dup PAIRS (MinHash/SimHash/
Jaccard candidates from operators/dedup.py) must become disjoint
CLUSTERS so exactly one canonical document per cluster survives.
Transitivity does that — if A~B and B~C then {A,B,C} is one cluster —
i.e. connected components of the similarity graph.

Algorithm: iterative min-label propagation with pointer halving, pure
DataFrame ops (the standard Spark formulation; cf. the alternating
large-star/small-star algorithm of Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14):

* each node starts labeled with itself;
* each round, a node takes the min label over itself + its neighbors
  (one shuffle join + one map-side-combinable min aggregate);
* then labels are shortcut one level (node -> label(label(node))) —
  pointer halving, which collapses label chains geometrically, so
  convergence needs O(log diameter) rounds, not O(diameter);
* iterate to fixpoint. The fixpoint test is exact and type-agnostic:
  join the new label relation to the previous one on the node key and
  probe for ANY changed label (``limit(1)``). Node ids may be strings
  (URLs, md5 fingerprints) or numbers — min-propagation only needs the
  label type to be orderable, and the change probe never casts.

Every round's result is localCheckpoint()ed: iterative DataFrame
algorithms otherwise double their lineage each round and the planner
chokes long before the data does. At 100 TB the per-round cost is two
shuffles on the node key; the similarity graphs dedup produces have
tiny components (near-dup clusters), so rounds ≈ 3-5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_iterations: int = 25) -> DataFrame:
    """Label every endpoint of ``edges`` with its component's min node id.

    Returns (node, component). Nodes appear iff they occur in an edge;
    use :func:`assign_clusters` to also keep isolated rows. Null
    endpoints are dropped; self-loops are harmless.
    """
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
           .distinct())
    sym = sym.localCheckpoint(eager=True)

    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("comp", F.col("node"))
              .localCheckpoint(eager=True))

    for _ in range(max_iterations):
        prev = labels
        prop = (sym.join(labels, sym["a"] == labels["node"])
                .select(F.col("b").alias("node"), F.col("comp")))
        cand = (labels.unionByName(prop)
                .groupBy("node").agg(F.min("comp").alias("comp")))
        # pointer halving: node -> label(label(node))
        l2 = cand.select(F.col("node").alias("c_node"),
                         F.col("comp").alias("c_comp"))
        labels = (cand.join(l2, cand["comp"] == l2["c_node"], "left")
                  .select("node",
                          F.least(F.col("comp"),
                                  F.coalesce("c_comp", "comp"))
                          .alias("comp"))
                  .localCheckpoint(eager=True))
        # exact, type-agnostic fixpoint probe: any label changed? Both
        # sides are checkpointed label relations (node set identical),
        # so this is one hash join + limit(1) — cheap next to the
        # propagate join, and it never casts the id type (a decimal
        # fingerprint would crash on string ids under ANSI mode, or
        # NULL out and false-converge with ANSI off).
        changed = (labels.join(
            prev.select("node", F.col("comp").alias("__prev_comp")),
            "node")
            .filter(F.col("comp") != F.col("__prev_comp"))
            .limit(1).count())
        if changed == 0:  # fixpoint
            return labels.select("node", F.col("comp").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} "
        "iterations; raise max_iterations (diameter too large for the "
        "halving schedule)")


def assign_clusters(df: DataFrame, key_col: str, pairs: DataFrame,
                    key_a: str = "key_a", key_b: str = "key_b",
                    cluster_col: str = "cluster_id") -> DataFrame:
    """Attach a ``cluster_col`` to every row of ``df``: the component's
    min key for rows that appear in ``pairs``, the row's own key
    otherwise (singleton cluster). Input ``pairs`` is any candidate-
    pair output from operators/dedup.py."""
    comp = connected_components(pairs, src=key_a, dst=key_b)
    return (df.join(comp, df[key_col] == comp["node"], "left")
            .select(*[df[c] for c in df.columns],
                    F.coalesce(F.col("component"), df[key_col])
                    .alias(cluster_col)))
