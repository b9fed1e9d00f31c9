"""Exact integer math shared across operators.

One definition of the floor-division idiom three operators need
(event-time bucketing, spatial grid cells, nano→micro timestamp
normalization). The trap it closes, once: Spark's ``div`` truncates
toward ZERO, so negative inputs land one bucket too high (pre-epoch
timestamps, negative grid coordinates), and a double ``/`` quotient
can sit a half-ulp below an exact boundary (ulp(1.7e18) = 256, far
above 1). Subtracting ``pmod`` (always non-negative) first makes the
dividend exactly divisible, so ``div``'s truncation IS floor and the
arithmetic never leaves int64.
"""

from __future__ import annotations


def exact_floordiv_sql(expr: str, n: int) -> str:
    """SQL fragment: FLOOR(``expr`` / ``n``) exactly, for a BIGINT
    expression and positive integer constant ``n``. Exact everywhere
    except within ``n`` of INT64_MIN (the ``x - pmod`` step would
    underflow there — unreachable for timestamps and coordinates).
    DuckDB twin: the same formula — ``pmod`` and integer division
    agree across engines, unlike ``%``/``//``."""
    if n <= 0:
        raise ValueError(f"exact_floordiv_sql: n must be positive, got {n}")
    return f"((({expr}) - pmod(({expr}), {n}L)) div {n}L)"
