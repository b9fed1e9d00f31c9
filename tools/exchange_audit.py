"""Audit every registry plan for mergeable shuffle pairs.

Finds ``Exchange hashpartitioning`` nodes whose key set is a PROPER
SUPERSET of another exchange's keys in the same plan. Spark satisfies
a ``ClusteredDistribution`` with a hash partitioning on any SUBSET of
the clustering keys, so when such a pair exists the narrower
partitioning could serve both operators and the wider exchange is a
merge candidate — the ``w11_running_distinct`` one-exchange rewrite
(an explicit ``repartition(narrow_key)`` ahead of the chain).

Not every pair should be merged. Each candidate is classified by the
node feeding the wider exchange:

- ``agg-shrunk``: a partial HashAggregate/ObjectHashAggregate feeds
  the WIDE exchange — the wide shuffle carries map-side-combined rows
  (often orders of magnitude fewer than the input), while the merge
  would shuffle RAW rows on the narrow key with no partial combine.
  Usually a LOSS; leave alone.
- ``narrow-shrunk``: an aggregate feeds the NARROW exchange — the
  narrow shuffle carries rows already shrunk by a groupBy, so merging
  saves only that negligible exchange while collapsing the wide one's
  parallelism onto the narrow key (the e9 hour-split sweep: the
  (day, hour) exchange carries full delta rows for 24× the
  parallelism; the day exchange moves one row per (day, hour)).
  Deliberate; leave alone.
- ``window-chain``: a Sort/Window/Project/Scan feeds both — full-width
  data crosses the wire twice. Repartitioning on the narrow key cuts
  one full shuffle. Usually a WIN when the narrow key's cardinality
  still gives parallelism (it must: the narrow-key operator needs
  that distribution anyway, so skew exposure is unchanged).

Usage: python tools/exchange_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_etl_data_warehouse_inside_airbnb_spark.session import get_spark  # noqa: E402

_EXCH = re.compile(r"Exchange hashpartitioning\(([^)]*)\)")
_NODE = re.compile(r"[A-Za-z]+")
_AGG_FED = ("HashAggregate", "ObjectHashAggregate",
            "SortAggregate")


_ATTR = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _depth(line: str) -> int:
    """Tree depth of a treeString line = the scaffold length (the
    ':  '/'+- ' prefix). '*' must NOT be in the strip set: a
    whole-stage-codegen node prints as '+- *(3) Node', and stripping
    its star (then stopping at '(') gave codegen nodes depth
    scaffold+1 while non-codegen siblings at the same tree level got
    scaffold — misjudging subtree ancestry in mixed plans (r8 advisor
    finding). Stopping at the star keeps the codegen prefix out of
    the depth entirely."""
    return len(line) - len(line.lstrip("+-: "))


def _keysets(plan: str):
    """(line_no, depth, frozenset(keys), feeder_node) per hash
    exchange. Exchanges keyed on EXPRESSIONS (not plain attributes)
    yield keys the flat regex can't parse — e.g.
    ``hashpartitioning(knownfloatingpointnormalized(...), 4)``
    truncates at the first ')' — so any keyset containing a
    non-identifier (or coming out empty) is dropped entirely: an
    unparseable exchange must never act as the universal empty subset
    that flags every sibling (r8 review finding)."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        m = _EXCH.search(line)
        if not m:
            continue
        keys = frozenset(re.sub(r"#\d+L?", "", k).strip()
                         for k in m.group(1).split(",")[:-1])
        if not keys or not all(_ATTR.match(k) for k in keys):
            continue
        feeder = ""
        if i + 1 < len(lines):
            n = _NODE.search(lines[i + 1].lstrip("+-*: ("))
            feeder = n.group(0) if n else ""
        out.append((i, _depth(line), keys, feeder))
    return out


def _in_subtree(lines, anc_line: int, anc_depth: int,
                desc_line: int) -> bool:
    """True iff ``desc_line`` sits inside the subtree rooted at
    ``anc_line`` in a treeString printout: every line strictly between
    them (and the descendant itself) is deeper than the ancestor."""
    if desc_line <= anc_line:
        return False
    return all(_depth(lines[k]) > anc_depth
               for k in range(anc_line + 1, desc_line + 1))


def audit_plan(plan: str):
    """[(wide_keys, narrow_keys, classification)] for one plan.

    A pair is reported only when the WIDE exchange feeds the NARROW
    one (the wide sits in the narrow's subtree — parents print above
    children in treeString): exchanges on independent branches of a
    join legitimately share attribute names (a self-join's two sides)
    and cannot be merged, so subtree ancestry is required, not just
    name-set containment (r8 review finding)."""
    found = []
    lines = plan.splitlines()
    exch = _keysets(plan)
    for i, (wline, wdepth, wide, feeder) in enumerate(exch):
        for j, (nline, ndepth, narrow, nfeeder) in enumerate(exch):
            if i == j or not (narrow < wide):
                continue
            if not _in_subtree(lines, nline, ndepth, wline):
                continue
            if feeder.startswith(_AGG_FED):
                cls = "agg-shrunk"
            elif nfeeder.startswith(_AGG_FED):
                cls = "narrow-shrunk"
            else:
                cls = "window-chain"
            found.append((tuple(sorted(wide)), tuple(sorted(narrow)),
                          cls))
    return found


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("exchange-audit", master="local[4]",
                      extra_conf={"spark.sql.shuffle.partitions": "4"})
    spark.sparkContext.setLogLevel("ERROR")
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import (
        REGISTRY,
    )
    n_cand = 0
    for name, q in sorted(REGISTRY.items()):
        try:
            plan = (q.build(spark, sf_dir)
                    ._jdf.queryExecution().executedPlan().toString())
        except Exception as ex:  # entry needs special env; report, move on
            print(f"err   {name}: {type(ex).__name__}")
            continue
        pairs = audit_plan(plan)
        wins = [p for p in pairs if p[2] == "window-chain"]
        if pairs:
            tag = "CAND " if wins else "ok   "
            n_cand += bool(wins)
            uniq = sorted(set(pairs))
            print(f"{tag}{name}: " + "; ".join(
                f"{list(w)}⊃{list(n)} [{c}]" for w, n, c in uniq))
    print(f"\n{n_cand} window-chain candidates")
    spark.stop()


if __name__ == "__main__":
    main()
