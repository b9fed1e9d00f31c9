"""Emit the adjudication-window head (``_PRIORITY``) mechanically.

The driver's correctness gate adjudicates ~the first 50 entries of
``plans/full_registry.REGISTRY`` per round; since r8 the window head
has been rewritten by hand each round following one rule (the same
staleness order every verdict recomputes):

- the *vintage* of an entry is the highest round N whose
  ``CORRECTNESS_rN.json`` contains it — files sorted NUMERICALLY by
  round number, never lexicographically (an unpadded ``r13`` must not
  sort before ``r2``);
- entries with no verdict row at all (in-round additions), plus any
  names passed via ``--front`` (in-round re-encodes whose output
  changed and therefore need a fresh hash verdict), take vintage 0
  and lead the window in the given order;
- the window is the WINDOW (default 50) oldest remaining entries,
  ordered by ``(vintage, name)``.

Usage::

    python tools/gen_priority.py            # print the r{next} window
    python tools/gen_priority.py --front ext_foo,ext_bar

Adjudicated names missing from the live REGISTRY (renames/removals)
are reported loudly rather than silently dropped — the same
no-silent-caps rule the hostile sweep follows.

``tests/test_plan_audit.py`` recomputes this window and asserts
``full_registry._PRIORITY`` equals it, so the committed head is a
check on this tool's output instead of on hand edits.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def round_of(path: str) -> int:
    m = re.search(r"r(\d+)\.json$", os.path.basename(path))
    if m is None:
        raise ValueError(f"unparseable correctness filename: {path}")
    return int(m.group(1))


def vintages(repo: str = REPO) -> dict[str, int]:
    """name -> highest round with a verdict row (numeric file order)."""
    out: dict[str, int] = {}
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")),
                   key=round_of)
    for f in files:
        rnd = round_of(f)
        for name in json.load(open(f)):
            out[name] = max(out.get(name, 0), rnd)
    return out


def compute_priority(registry_names, vintage: dict[str, int],
                     window: int = 50, front=()) -> list[str]:
    """The window head: front (re-encodes) > never-adjudicated > oldest."""
    names = list(registry_names)
    nameset = set(names)
    unknown_front = [n for n in front if n not in nameset]
    if unknown_front:
        raise ValueError(f"--front names not in REGISTRY: {unknown_front}")
    head = list(dict.fromkeys(front))
    head += sorted(n for n in names
                   if n not in vintage and n not in head)
    rest = sorted((n for n in names if n in vintage and n not in head),
                  key=lambda n: (vintage[n], n))
    return (head + rest)[:window]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--front", default="",
                    help="comma-separated re-encoded names to lead")
    args = ap.parse_args(argv)

    sys.path.insert(0, REPO)
    from sql_etl_data_warehouse_inside_airbnb_spark.plans.full_registry import REGISTRY

    vint = vintages()
    dropped = sorted(n for n in vint if n not in REGISTRY)
    if dropped:
        print(f"# WARNING: {len(dropped)} adjudicated names not in "
              f"REGISTRY (renamed/removed?): {dropped}", file=sys.stderr)
    front = [n for n in args.front.split(",") if n]
    prio = compute_priority(REGISTRY, vint, args.window, front)
    hist: dict[int, int] = {}
    for n in prio:
        hist[vint.get(n, 0)] = hist.get(vint.get(n, 0), 0) + 1
    print(f"# window={len(prio)} vintage-mix "
          f"{ {k: hist[k] for k in sorted(hist)} }")
    print("_PRIORITY = [")
    for n in prio:
        print(f'    "{n}",')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
