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


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Global triangle count of the undirected graph — 1 row
    ``(n_triangles BIGINT)``.

    Triangles measure how clique-like a near-dup similarity graph is
    (a cluster whose pairs are mutually similar vs a chain stitched
    by borderline pairs) — the standard health check before trusting
    transitive-closure dedup clusters.

    Algorithm: the degree-ordering formulation (Suri/Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11).
    Each undirected edge is directed from its lower-(degree, id)
    endpoint to the higher one, making the graph a DAG where every
    out-degree is O(sqrt(m)); a triangle is then exactly one
    wedge a->b->c closed by a->c, so two equi-joins count each
    triangle once. At 100 TB this bounds the worst reducer: the
    naive a<b<c 3-way self-join explodes on hub nodes, the
    degree-ordered one cannot.
    """
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
           .filter(F.col("u") != F.col("v")))
    und = (sym.select(F.least("u", "v").alias("u"),
                      F.greatest("u", "v").alias("v"))
           .distinct())
    deg = (und.select(F.col("u").alias("n"))
           .unionAll(und.select(F.col("v").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).alias("d")))
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ranked = (und.join(du, "u").join(dv, "v")
              .select(
                  F.when((F.col("du") < F.col("dv"))
                         | ((F.col("du") == F.col("dv"))
                            & (F.col("u") < F.col("v"))),
                         F.col("u")).otherwise(F.col("v")).alias("a"),
                  F.when((F.col("du") < F.col("dv"))
                         | ((F.col("du") == F.col("dv"))
                            & (F.col("u") < F.col("v"))),
                         F.col("v")).otherwise(F.col("u")).alias("b")))
    # the directed edge relation feeds THREE join inputs — LAZY
    # localCheckpoint so the edge-derivation subtree (dedup + two
    # degree joins) runs once at first action, not three times
    # (.explain showed triple recomputation). Lazy keeps the wedge/
    # closing joins visible to plan-only callers (the registry-wide
    # physical-plan audit) and runs no job at build time; the
    # checkpoint blocks are released when the RDD is GC'd — the same
    # lifecycle as connected_components' per-round checkpoints.
    ranked = ranked.localCheckpoint(eager=False)
    e1 = ranked.select(F.col("a"), F.col("b"))
    e2 = ranked.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = ranked.select(F.col("a"), F.col("b").alias("c"))
    tri = wedges.join(closing, ["a", "c"], "inner")
    return tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             damping: float = 0.85, max_iterations: int = 30,
             tol: float = 1e-6) -> DataFrame:
    """PageRank over the DIRECTED edge list — (node, rank DOUBLE),
    ranks summing to ~1.

    The canonical iterative-join workload (Page/Brin '98; the
    Pregel-style Spark formulation): each round one shuffle join
    (rank/out_degree contributions onto edges) + one aggregate by
    destination; dangling mass is redistributed uniformly so ranks
    stay a distribution. Rounds localCheckpoint like
    :func:`connected_components` (lineage would otherwise double per
    round); convergence = L1 delta < ``tol``, one scalar aggregate
    per round. Float-iterative, so oracle checking is rows-only; the
    pytest pins a hand-solvable graph and the Σrank=1 invariant.

    r13 restructure (guide §2.4): the per-round state carries the
    STATIC out-degree, so the ranks⋈outdeg join is paid once, not
    every round; the L1-delta probe reads the previous rank off the
    round's own checkpointed frame instead of re-joining old and new
    rank relations. Per-round joins 4 → 2, checkpoint jobs 2 → 1,
    identical arithmetic; since the round checkpoint went LAZY the L1
    probe is also the materializing job, so each round schedules
    exactly ONE job.

    r14 (advisor item): the r13 repartition-before-checkpoint is
    GONE — a localCheckpoint surfaces as Scan ExistingRDD with
    UnknownPartitioning under AQE (the r13 g9 finding), so the
    per-round contributions join re-exchanged ``sym`` anyway
    (verified: round plans show 4 hash exchanges with or without it);
    the repartition only added a setup exchange. Two alternatives
    were measured and REJECTED: persist()-based rounds (which would
    preserve partitioning via InMemoryRelation) blow up the
    un-truncatable logical tree exponentially — state appears 3x per
    round, and the driver OOM'd stringifying the round-13 plan — and
    fusing the dangling-mass aggregate into the L1 probe as a plan
    literal measured neutral (interleaved min-of-4: 4.46 s ckpt vs
    4.66 s fused).
    """
    sym = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
           .filter(F.col("s").isNotNull() & F.col("d").isNotNull())
           .localCheckpoint(eager=True))  # re-joined every round
    nodes = (sym.select(F.col("s").alias("node"))
             .unionAll(sym.select(F.col("d").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("outd"))
    state = (nodes.join(outdeg, nodes["node"] == outdeg["s"], "left")
             .select("node", F.lit(1.0 / n).alias("rank"), "outd")
             .localCheckpoint(eager=True))
    for _ in range(max_iterations):
        # dangling nodes (no out-edges) spread their mass uniformly —
        # folded into the lineage as a 1-row broadcast (the bm25 N/
        # avgdl pattern), NOT a driver collect per round; it reads the
        # already-checkpointed state, so nothing recomputes
        dang = (state.filter(F.col("outd").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                     .alias("__dang")))
        contrib = (sym.join(state.filter(F.col("outd").isNotNull()),
                            sym["s"] == F.col("node"))
                   .select(F.col("d").alias("node"),
                           (F.col("rank") / F.col("outd"))
                           .alias("c")))
        new_state = (state.select("node", "outd",
                                  F.col("rank").alias("__prev"))
                     .join(contrib.groupBy("node")
                           .agg(F.sum("c").alias("cs")),
                           "node", "left")
                     .crossJoin(F.broadcast(dang))
                     .select("node", "outd",
                             (F.lit((1.0 - damping) / n)
                              + F.lit(damping) * F.col("__dang")
                              / F.lit(float(n))
                              + F.lit(damping)
                              * F.coalesce("cs", F.lit(0.0)))
                             .alias("rank"),
                             "__prev")
                     .localCheckpoint(eager=False))
        # the one scalar action per round: L1 convergence probe, over
        # the checkpointed frame that already carries prev — no join.
        # The checkpoint is LAZY so this probe IS the materializing
        # job (an L1 sum scans every partition, so materialization is
        # complete) — 2 jobs/round collapse to 1, identical arithmetic
        delta = (new_state
                 .agg(F.sum(F.abs(F.col("rank") - F.col("__prev"))))
                 .collect()[0][0])
        state = new_state.drop("__prev")
        if delta is not None and delta < tol:
            break
    return state.select("node", "rank")


def k_core(edges: DataFrame, k: int, src: str = "src",
           dst: str = "dst", max_rounds: int = 30) -> DataFrame:
    """k-core decomposition membership: iteratively peel nodes of
    degree < k (each removal can drop a neighbor below k, so peeling
    repeats to a fixpoint) and return the surviving nodes with their
    final in-core degree — the densest-region primitive between
    connected components (too coarse) and triangles (too local):
    spam/fraud rings, community cores, and near-dup cluster kernels
    all live in high-k cores.

    Per round: one symmetric-degree aggregate + one semi join to drop
    edges touching peeled nodes — both map-side-combinable shuffles
    on the node key, localCheckpoint lineage control (the g6/g7
    discipline), and ONE scalar count per round for the convergence
    probe (bounded driver traffic). Terminates at the fixpoint; real
    graphs converge in a few dozen peels because each round removes
    every currently-sub-k node at once (synchronous peel), not one
    node at a time. A pathological graph that is still peeling when
    ``max_rounds`` runs out (e.g. a long path at k=2 sheds one layer
    per round) would return nodes NOT in the true k-core, so — like
    pagerank's documented tolerance exit — non-convergence is
    signaled, not swallowed: a RuntimeWarning fires and the caller
    can raise rounds (r6 advisor item).
    """
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .filter(F.col("u") != F.col("v")))
    sym = (e.unionByName(e.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
           .distinct().localCheckpoint())
    n_edges = sym.count()
    converged = False
    for _ in range(max_rounds):
        deg = sym.groupBy("u").agg(F.count("*").alias("__deg"))
        keep = deg.filter(F.col("__deg") >= k).select("u")
        # LAZY checkpoint: the convergence count below scans every
        # partition, so it is the materializing job — 2 jobs/round
        # collapse to 1 (the k_core_rounds precedent)
        nxt = (sym.join(keep, "u", "left_semi")
               .join(keep.select(F.col("u").alias("v")), "v",
                     "left_semi")
               .localCheckpoint(eager=False))
        n_next = nxt.count()
        sym = nxt
        if n_next == n_edges:
            converged = True
            break
        n_edges = n_next
    if not converged:
        # r7 advisor: the loop only flags convergence when a CONFIRMING
        # round observes no change, so hitting the fixpoint exactly on
        # the last allowed round (or max_rounds=0 on an already-stable
        # graph) would warn spuriously. One extra count-only probe —
        # no checkpoint, the surviving frame is already final —
        # settles it.
        deg = sym.groupBy("u").agg(F.count("*").alias("__deg"))
        keep = deg.filter(F.col("__deg") >= k).select("u")
        n_probe = (sym.join(keep, "u", "left_semi")
                   .join(keep.select(F.col("u").alias("v")), "v",
                         "left_semi").count())
        converged = n_probe == n_edges
    if not converged:
        import warnings

        warnings.warn(
            f"k_core({k=}) did not reach the peel fixpoint within "
            f"max_rounds={max_rounds} ({n_edges} directed edges still "
            "shrinking); the returned nodes OVER-approximate the true "
            "k-core — raise max_rounds", RuntimeWarning, stacklevel=2)
    return (sym.groupBy(F.col("u").alias("node"))
            .agg(F.count("*").cast("bigint").alias("core_degree")))


def k_core_rounds(edges: DataFrame, k: int, rounds: int,
                  src: str = "src", dst: str = "dst") -> DataFrame:
    """Bounded-round synchronous k-core peel — the ORACLE-CHECKABLE
    twin of :func:`k_core` (the r9-verdict item-6 conversion, the
    g8/MMR unroll playbook): a FIXED number of peel rounds instead of
    the data-dependent fixpoint probe, so the whole pipeline is pure
    integer with a static shape and unrolls into static SQL CTEs.

    Semantics: after ``rounds`` synchronous peels (each drops every
    node of current symmetric degree < k and the edges touching it),
    emit the surviving nodes with their in-subgraph degree. When the
    peel happens to converge within ``rounds`` this equals the true
    k-core; when it does not, the result OVER-approximates it (the
    same over-approximation :func:`k_core` documents for max_rounds
    exhaustion — here it is the declared contract, not a warning).

    Per round: one map-side-combinable degree aggregate + two semi
    joins, with LAZY localCheckpoint lineage control — no convergence
    counts, so zero driver traffic inside the loop, and (unlike the
    fixpoint sibling, whose per-round count probe forces a job each
    round) no per-round action either: the lazy checkpoints
    materialize once, in topological order, inside the single final
    action's cascade (the triangle_count precedent; r13 A/B min
    1.70 s vs 1.89 s eager, row-equal). Each round's frame persists
    exactly once in the common case — both its consumers (next
    round's degree agg and semi join) read the shared cached RDD —
    but on FIRST materialization two sibling stages can race and
    compute the same partition twice before the cache fills
    (duplicate work, never wrong results; r13 observed the race
    making the same move neutral in g7 and verified its absence here
    over 16 timed runs — "identical to eager" is the expected case,
    not a guarantee). Two lineage caveats for LARGE ``rounds``: with
    no intra-loop action, Spark's doCheckpoint finalizes only the
    nearest marked RDD at the single final action (default
    spark.checkpoint.checkpointAllMarkedAncestors=false), so
    intermediate rounds stay persisted-but-untruncated and lineage
    depth grows linearly with ``rounds``. The bench entries run
    rounds <= 6 where this is immaterial; for large round counts set
    checkpointAllMarkedAncestors=true or checkpoint eagerly every K
    rounds. At 100 TB each round is two shuffles on the node key;
    ``rounds`` is a static plan parameter.

    Setup fuses the edge-canonicalization distinct into the
    post-union symmetrization distinct (any duplicate in ``e`` is
    removed there anyway — one fewer exchange + aggregate, identical
    rows; the fixpoint sibling shares the move).
    """
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .filter(F.col("u") != F.col("v")))
    sym = (e.unionByName(e.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
           .distinct().localCheckpoint(eager=False))
    for _ in range(rounds):
        deg = sym.groupBy("u").agg(F.count("*").alias("__deg"))
        keep = deg.filter(F.col("__deg") >= k).select("u")
        sym = (sym.join(keep, "u", "left_semi")
               .join(keep.select(F.col("u").alias("v")), "v",
                     "left_semi")
               .localCheckpoint(eager=False))
    return (sym.groupBy(F.col("u").alias("node"))
            .agg(F.count("*").cast("bigint").alias("core_degree")))


def pagerank_fixed_point(edges: DataFrame, iterations: int = 5,
                         scale: int = 1_000_000_000_000,
                         src: str = "src", dst: str = "dst"
                         ) -> DataFrame:
    """Integer fixed-point PageRank — the ORACLE-CHECKABLE twin of
    :func:`pagerank` (the r10 unroll playbook's float-iterative
    conversion): ranks live in 1/``scale`` units as exact int64, the
    damping 0.85 is the rational 85/100 applied as integer
    multiply-then-floor-divide, and the round count is FIXED — so
    every arithmetic step is bit-identical on any engine with int64
    floor division (Spark ``div`` == DuckDB ``//``, verified), and
    the whole computation unrolls into static SQL CTEs.

    Declared semantics (the floor losses are part of the contract,
    not noise): r0 = scale // N for every node; each round every
    node gets  teleport + (85 * (insum + dang_share)) // 100  where
    teleport = (15 * scale) // (100 * N),
    insum = Σ_{u→v} r(u) // out_deg(u), and
    dang_share = (Σ_{out_deg(u)=0} r(u)) // N. Total mass stays ≤
    scale (floors only ever drop units); pinned in tests.

    Scale shape: per round ONE shuffle on the destination key (the
    contributions aggregate); the dangling mass is a 1-row aggregate
    folded into the lineage as a broadcast cross join (the float
    twin's bm25-N/avgdl pattern) — ZERO driver traffic inside the
    loop, because unlike the float twin there is no convergence probe
    either: the round count is fixed. That lets every round's
    checkpoint be LAZY (the k_core_rounds/triangle_count precedent):
    the whole peel materializes as one action cascade at first
    consumption, each round's frame persisting exactly once. N and
    the teleport are plan literals derived from one bounded count.

    r13 restructure (guide §2.4, mirrors the float twin): the round
    state carries the STATIC degree (nullable — NULL marks dangling),
    so the per-round degree broadcast join and the dangling anti-join
    both disappear. Integer arithmetic is order-independent, so the
    output is bit-identical to the pre-restructure encoding (the
    oracle contract is untouched). r14 (advisor item): the
    repartition-before-checkpoint is gone — checkpointed frames
    surface as UnknownPartitioning under AQE, so the per-round join
    re-exchanged the edge relation regardless (see :func:`pagerank`);
    it only cost a setup exchange.
    """
    e = (edges.select(F.col(src).alias("esrc"), F.col(dst).alias("edst"))
         .distinct().localCheckpoint(eager=False))
    nodes = (e.select(F.col("esrc").alias("node"))
             .unionByName(e.select(F.col("edst").alias("node")))
             .distinct().localCheckpoint(eager=False))
    outdeg = (e.groupBy(F.col("esrc").alias("node"))
              .agg(F.count("*").cast("bigint").alias("deg")))
    # the one unavoidable setup action (n and the teleport are plan
    # literals); it also materializes the lazy e/nodes checkpoints
    n = nodes.count()
    if n == 0:
        # empty graph: same contract as pagerank() — empty frame out,
        # and no ZeroDivisionError from the teleport constant
        return nodes.select("node",
                            F.lit(0).cast("bigint").alias("rank_fp"))
    teleport = (15 * scale) // (100 * n)
    # state = (node, deg NULLABLE, r): deg IS NULL == dangling — the
    # old per-round left_anti against outdeg and the broadcast degree
    # join are both folded into this one join, paid once
    state = (nodes.join(outdeg, "node", "left")
             .select("node", "deg",
                     F.lit(scale // n).cast("bigint").alias("r"))
             .localCheckpoint(eager=False))
    for _ in range(iterations):
        # dangling mass as a 1-row broadcast folded into the lineage
        # (the float twin's pattern) instead of a per-round .first():
        # __dang and r are non-negative int64, so Spark's `div`
        # (truncation) equals the old Python `//` (floor) exactly
        dang = (state.filter(F.col("deg").isNull())
                .agg(F.coalesce(F.sum("r"), F.lit(0))
                     .cast("bigint").alias("__dang")))
        contrib = (e.join(state.filter(F.col("deg").isNotNull()),
                          F.col("esrc") == F.col("node"))
                   .select(F.col("edst").alias("node"),
                           F.expr("r div deg").alias("c")))
        insum = contrib.groupBy("node").agg(
            F.sum("c").cast("bigint").alias("insum"))
        state = (state.select("node", "deg")
                 .join(insum, "node", "left")
                 .crossJoin(F.broadcast(dang))
                 .select(F.col("node"), F.col("deg"),
                         (F.lit(teleport)
                          + F.expr(f"(85 * (coalesce(insum, "
                                   f"CAST(0 AS BIGINT)) "
                                   f"+ (__dang div {n}))) div 100"))
                         .cast("bigint").alias("r"))
                 .localCheckpoint(eager=False))
    return state.select("node", F.col("r").alias("rank_fp"))
