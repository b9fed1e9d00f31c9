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


def test_per_query_chunks_survive_a_2000_byte_tail():
    """r13 verdict item 7: the driver keeps only the last ~2000 bytes
    of stdout; the headline map is re-emitted as standalone chunk
    lines small enough that the maintenance map, the summary, and at
    least the last two headline chunks always sit WHOLE inside that
    window and parse independently."""
    headline, maint = _fake(67), _fake(8)
    lines = emit_lines("0.1", 48.107, headline, maint)
    # every chunk line parses alone and the union rebuilds the map
    chunk_lines = [ln for ln in lines if '"headline_part"' in ln]
    assert chunk_lines, "no headline chunk lines emitted"
    rebuilt: dict[str, float] = {}
    for ln in chunk_lines:
        d = json.loads(ln)
        assert len(ln) < 800, "chunk outgrew its byte budget"
        rebuilt.update(d["queries"])
    assert rebuilt == headline
    # maintenance is one standalone parseable line before the summary
    maint_line = json.loads(lines[-2])
    assert maint_line == {"maintenance": maint}
    # the 2000-byte tail keeps, whole: summary + maintenance + >=2
    # headline chunks (so a truncated capture still yields a usable
    # per-query table)
    tail = "\n".join(lines)[-2000:]
    surviving = [ln for ln in tail.splitlines()
                 if '"headline_part"' in ln]
    parsed = 0
    for ln in surviving:
        try:
            json.loads(ln)
            parsed += 1
        except json.JSONDecodeError:
            pass
    assert parsed >= 2, f"only {parsed} whole chunks in the tail"
    json.loads(tail.splitlines()[-1])   # summary intact
    assert json.loads(tail.splitlines()[-2]) == {"maintenance": maint}


def test_summary_totals_are_consistent():
    timings = {"a": 1.0, "b": 2.5}
    lines = emit_lines(None, 9.0, timings, {"m": 4.0})
    summary = json.loads(lines[-1])
    assert summary["value"] == summary["headline_total_sec"] == 3.5
    assert summary["sf"] is None  # non-conforming dir must not crash
    assert summary["n_queries"] == 2 and summary["n_maintenance"] == 1
    assert summary["maintenance_total_sec"] == 4.0


def test_latest_committed_artifact_parses(tmp_path):
    """r11 verdict item 5: exercise the REAL driver artifact, not just
    synthetic emit_lines output, so an emit-format regression fails CI
    instead of costing a round. The newest committed BENCH_r*.json
    must carry a non-null `parsed` summary (the tail-captured final
    line survived whole), its tail's regex-recoverable per-query
    timings must sum to the summary's headline+maintenance totals
    within rounding, and tools/bench_compare.py must recover a
    non-empty timing map from it (self-comparison geomean exactly 1)."""
    import glob
    import importlib.util
    import math
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    if not arts:  # bare checkout
        return
    latest = arts[-1]
    art = json.load(open(latest))
    parsed = art.get("parsed")
    # r1-r10 artifacts predate the two-line contract; only artifacts
    # from r11 on are required to parse
    rnd = int(re.search(r"BENCH_r(\d+)", latest).group(1))
    if rnd < 11:
        return
    assert isinstance(parsed, dict), f"{latest}: parsed is null"
    for key in ("headline_total_sec", "n_queries",
                "maintenance_total_sec", "n_maintenance"):
        assert key in parsed, key

    spec = importlib.util.spec_from_file_location(
        "bench_compare", os.path.join(repo, "tools", "bench_compare.py"))
    bc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bc)
    got = bc.timings(latest)
    assert got, f"{latest}: bench_compare recovered no timings"
    # the artifact's detail line may be tail-truncated (its FRONT is
    # lost), so the recovered map is a suffix of the full set — every
    # recovered timing must be consistent with the totals: the map
    # can never sum to MORE than headline+maintenance (+rounding)
    total = parsed["headline_total_sec"] + parsed["maintenance_total_sec"]
    n = parsed["n_queries"] + parsed["n_maintenance"]
    assert len(got) <= n
    assert sum(got.values()) <= total + 0.001 * n
    # and when nothing was truncated, the sums must AGREE
    if len(got) == n:
        assert math.isclose(sum(got.values()), total,
                            abs_tol=0.001 * n + 1e-6)
