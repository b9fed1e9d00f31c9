"""Compare two bench artifacts (or raw bench stdout) per query.

Usage: python tools/bench_compare.py OLD NEW

Each input may be a BENCH_r*.json driver artifact (whose `raw` tail
may be truncated — per-query timings are recovered by regex) or a
file holding bench.py stdout. Prints per-query ratios (NEW/OLD) for
the shared headline set, the geometric mean, and every query whose
ratio exceeds 1.3 (the r10 verdict's investigation threshold).
"""

from __future__ import annotations

import json
import math
import re
import sys


def _merge(headline: dict, maintenance: dict) -> dict[str, float]:
    clash = sorted(set(headline) & set(maintenance))
    if clash:  # not assert: must survive python -O
        raise ValueError(
            f"headline/maintenance key collision: {clash}")
    return {k: float(v) for k, v in {**headline, **maintenance}.items()}


def timings(path: str) -> dict[str, float]:
    text = open(path).read()
    # candidate JSON payloads: the whole file (a driver artifact),
    # else each line (bench stdout: detail line + summary line)
    candidates = [text] + list(reversed(text.strip().splitlines()))
    # r14: bench.py additionally re-emits the headline map as small
    # `headline_part i/k` chunk lines plus one standalone maintenance
    # line (tail-window survival). Prefer the full detail line; when
    # only chunks survive (a truncated driver tail), merge every whole
    # chunk + the maintenance line instead of returning the single
    # last chunk.
    chunk_queries: dict[str, float] = {}
    chunk_maint: dict[str, float] = {}
    for cand in candidates:
        try:
            d = json.loads(cand)
        except ValueError:
            continue
        if not isinstance(d, dict):
            continue
        if "headline_part" in d:
            if isinstance(d.get("queries"), dict):
                chunk_queries.update(d["queries"])
            continue
        if set(d) == {"maintenance"} and isinstance(d["maintenance"], dict):
            chunk_maint.update(d["maintenance"])
            continue
        # merge headline + maintenance so the JSON path compares the
        # SAME query set the regex-recovery path does (which cannot
        # tell the two maps apart in a truncated tail) — enforced
        # disjoint so a future name collision fails loudly instead of
        # a maintenance timing silently overwriting a headline one
        if isinstance(d.get("queries"), dict) and d["queries"]:
            return _merge(d["queries"], d.get("maintenance") or {})
        parsed = d.get("parsed")
        if (isinstance(parsed, dict)
                and isinstance(parsed.get("queries"), dict)):
            return _merge(parsed["queries"],
                          parsed.get("maintenance") or {})
        if isinstance(d.get("tail"), str):
            text = d["tail"]
            break
    if chunk_queries or chunk_maint:
        return _merge(chunk_queries, chunk_maint)
    # regex recovery from a (possibly truncated) tail
    got = dict(re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', text))
    drop = {"value", "sf", "headline_total_sec", "n_queries",
            "cold_total_sec", "maintenance_total_sec", "n_maintenance"}
    return {k: float(v) for k, v in got.items() if k not in drop}


def main() -> None:
    old, new = timings(sys.argv[1]), timings(sys.argv[2])
    shared = sorted(set(old) & set(new))
    if not shared:
        print("no shared queries")
        return
    # bench.py rounds to ms, so a sub-ms query records 0.0 — those
    # have no meaningful ratio; report them instead of hiding them
    zeros = [q for q in shared if old[q] == 0]
    for q in zeros:
        print(f"  no-ratio (old=0.000) {q}: new={new[q]:.3f}")
    ratios = {q: new[q] / old[q] for q in shared if old[q] > 0}
    if not ratios:
        print(f"shared={len(shared)}, all old timings 0.000 — "
              "no ratios")
        return
    geo = math.exp(sum(math.log(r) for r in ratios.values())
                   / len(ratios))
    print(f"shared={len(shared)} geomean={geo:.3f}")
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        if r > 1.3:
            print(f"  >1.3x  {q}: {old[q]:.3f} -> {new[q]:.3f} "
                  f"({r:.2f}x)")


if __name__ == "__main__":
    main()
