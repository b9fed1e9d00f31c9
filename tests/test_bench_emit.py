"""Pin bench.py's two-line output contract (r10 verdict item 1):
the driver stores only the TAIL of bench stdout, so the FINAL line
must be a small, self-contained, json-parseable summary — two rounds
lost their headline totals to single-line formats (r9: totals after
the map, truncated; r10: summary-first, truncated from the other
end). This test fails if anyone reorders the lines, folds them back
into one, or lets the summary grow past the driver's capture."""

from __future__ import annotations

import json

from bench import emit_lines


def _fake(n: int) -> dict[str, float]:
    return {f"q{i:03d}_some_quite_long_query_name": 0.123 + i
            for i in range(n)}


def test_last_line_is_compact_standalone_summary():
    lines = emit_lines("0.1", 48.107, _fake(200), _fake(20))
    assert len(lines) == 2
    summary = json.loads(lines[-1])  # the TAIL-surviving line
    assert summary["metric"] == "headline_query_runtime"
    for key in ("value", "unit", "sf", "headline_total_sec",
                "n_queries", "cold_total_sec",
                "maintenance_total_sec", "n_maintenance"):
        assert key in summary, key
    # no per-query maps on the final line — THEY are what outgrew
    # the capture in r9/r10 — and the line stays far inside the
    # driver's ~2000-char tail even alongside a trailing newline
    assert "queries" not in summary and "maintenance" not in summary
    assert len(lines[-1]) < 500
    # detail first: full maps for regex recovery, same summary fields
    detail = json.loads(lines[0])
    assert detail["queries"] and detail["maintenance"]
    assert detail["headline_total_sec"] == summary["headline_total_sec"]


def test_summary_totals_are_consistent():
    timings = {"a": 1.0, "b": 2.5}
    lines = emit_lines(None, 9.0, timings, {"m": 4.0})
    summary = json.loads(lines[-1])
    assert summary["value"] == summary["headline_total_sec"] == 3.5
    assert summary["sf"] is None  # non-conforming dir must not crash
    assert summary["n_queries"] == 2 and summary["n_maintenance"] == 1
    assert summary["maintenance_total_sec"] == 4.0
