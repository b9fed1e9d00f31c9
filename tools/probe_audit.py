"""Offline-index plan lint (r10 verdict item 4).

The r7/r9 smell class: an ANN/retrieval PROBE whose physical plan
re-fits the quantizer codebook inline — a corpus-wide min/max/avg
aggregate over the exploded vector dimensions running on every query
instead of once at index-build time. r10 closed the two concrete
instances (IVFADC + quantized-MMR) with named plan pins
(tests/test_r10.py); this lint generalizes those pins into a
registry-wide invariant so the class cannot recur in NEW entries.

Signature of the smell, readable off ``executedPlan().toString()``:

- a vector explode (``posexplode`` — every per-dimension codebook fit
  starts by flattening the embedding array), AND
- a partial min/max/avg aggregate (the codebook fit itself — grouped
  stats always plan a partial phase before the exchange), AND
- a probe-shaped top-k cut (``TakeOrderedAndProject`` — the thing
  that makes the query a per-request PROBE rather than a one-shot
  corpus aggregation or an index-build job).

A plan carrying all three is scoring queries against a quantizer it
just fit — at 100 TB that is a full corpus scan per probe. Entries
whose SEMANTICS are the inline fit (the self-contained quantize+score
demo) are allowlisted by name in the caller, asserted both ways like
test_plan_audit's other whitelists.
"""

from __future__ import annotations

FIT_TOKENS = ("partial_min", "partial_max", "partial_avg")
EXPLODE_TOKENS = ("posexplode", "PosExplode")
TOPK_TOKEN = "TakeOrderedAndProject"


def inline_fit_probe(plan: str) -> bool:
    """True iff ``plan`` carries the inline-codebook-fit-probe
    signature (explode + corpus stats fit + top-k probe cut)."""
    return (any(t in plan for t in EXPLODE_TOKENS)
            and any(t in plan for t in FIT_TOKENS)
            and TOPK_TOKEN in plan)
