"""Python UDTF surface (table functions): one input row → many output
rows with a declared schema.

The reference has no row-generating operator at all; Spark's built-in
``explode``/``posexplode`` (registry f19) is the JVM fast path for the
common cases. A Python UDTF is the *generic* custom-generator
mechanism — reach for it only when the row expansion genuinely needs
Python logic (external parser, per-row model call), exactly like the
pandas-UDF rule for scalar functions: built-ins first, Arrow-batched
Python only when semantics demand it.

Scale note: UDTF evaluation is partition-parallel (each task streams
its rows through the Python worker); no state is shared across rows,
so the operator scales like any narrow map — but it is still a
Python-boundary crossing, so the hot path should prefer explode.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="token: string, pos: bigint")
class TokenizeUdtf:
    """Emit (token, 1-based position) per whitespace token — the UDTF
    twin of ``posexplode(split(lower(trim(text)), '\\s+'))``, oracle-
    checked against the same SQL as registry f19."""

    def eval(self, text: str):  # noqa: D102 - interface method
        if text is None:
            return
        # mirror SQL trim()/Java \s EXACTLY: SQL trim strips only
        # spaces (Python .strip() would also eat \t/\n and shift
        # positions vs the oracle), and Java \s is the explicit
        # [ \t\n\x0B\f\r] class (Python \s would add Unicode spaces).
        # re.split of "" yields [""] — same one-empty-token result as
        # split('\s+') on both engines, no special case needed.
        stripped = text.strip(" ").lower()
        for i, tok in enumerate(
                re.split(r"[ \t\n\x0B\f\r]+", stripped)):
            yield (tok, i + 1)


def register_udtfs(spark) -> None:
    """Make the UDTF surface available to SQL (LATERAL joins)."""
    spark.udtf.register("tokenize", TokenizeUdtf)
