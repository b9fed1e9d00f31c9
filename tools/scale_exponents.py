"""Compute per-query scaling exponents from two bench runs at
different scale factors (r12 verdict item 5).

exponent = log(t_big / t_small) / log(sf_big / sf_small)

1.0 = perfectly linear in data size; < 1 = fixed overheads dominate
at the small end (sub-linear is expected while per-query times are
fractions of a second); > 1 = super-linear growth worth explaining
(global sorts are n·log n; anything beyond that is a finding).

Usage: python tools/scale_exponents.py SMALL_OUT BIG_OUT ratio
       (SMALL_OUT/BIG_OUT are bench.py stdout files; ratio is
       sf_big / sf_small, e.g. 5)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tools.bench_compare import timings


def main() -> None:
    small, big = timings(sys.argv[1]), timings(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    shared = sorted(set(small) & set(big))
    rows = []
    for q in shared:
        if small[q] <= 0 or big[q] <= 0:
            continue
        e = math.log(big[q] / small[q]) / math.log(ratio)
        rows.append((e, q, small[q], big[q]))
    if not rows:
        raise SystemExit("no shared queries with positive timings — "
                         "are both inputs bench.py outputs?")
    rows.sort(reverse=True)
    print(f"| query | t(small) s | t(big) s | exponent |")
    print(f"|---|---|---|---|")
    for e, q, ts, tb in rows:
        print(f"| {q} | {ts:.3f} | {tb:.3f} | {e:+.2f} |")
    exps = [r[0] for r in rows]
    print(f"\nn={len(exps)} median_exponent="
          f"{sorted(exps)[len(exps) // 2]:.2f} "
          f"max={max(exps):.2f} ({rows[0][1]})")


if __name__ == "__main__":
    main()
