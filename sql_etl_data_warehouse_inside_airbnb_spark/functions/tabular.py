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
        stripped = text.strip().lower()
        if not stripped:
            # split('\s+') on an empty string yields one empty token
            # in both Spark and DuckDB; mirror that exactly
            yield ("", 1)
            return
        for i, tok in enumerate(re.split(r"\s+", stripped)):
            yield (tok, i + 1)


def register_udtfs(spark) -> None:
    """Make the UDTF surface available to SQL (LATERAL joins)."""
    spark.udtf.register("tokenize", TokenizeUdtf)
