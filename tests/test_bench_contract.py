"""The bench's driver contract: ONE parseable JSON line that fits the
driver's ~2000-char stdout-tail capture window at full suite width.

BENCH_r14.json recorded `parsed: null` because the r14 instrumentation
(a 40-entry per-query contention dict) pushed the line past the capture
window — the guard against a repeat lives in ``bench.emit_line`` and is
pinned here at worst-case width, with no Spark session needed.
"""

from __future__ import annotations

import json

import bench


def _real_suite(contended: bool):
    # the REAL headline names — the contract must hold for the suite
    # the driver actually runs, at worst-case (3-decimal) value widths
    names = list(bench.HEADLINE)
    assert len(names) >= 40
    timings = {n: 123.456 for n in names}
    contention = {n: (0.1234 if contended else 0.0003) for n in names}
    return timings, contention


def test_emit_line_fits_capture_window_at_full_width():
    """Every headline query contended (the contention dict at its
    maximum size) must still emit a parseable line inside the window —
    this is the exact failure mode that truncated BENCH_r14; the
    emitter degrades by keeping the worst offenders and counting the
    dropped rest, NEVER by asserting away the round's artifact."""
    timings, contention = _real_suite(contended=True)
    line = bench.emit_line(timings, contention, "0.1", 11.06, 32)
    assert len(line) < 1800
    doc = json.loads(line)
    assert doc["metric"] == "headline_suite_total"
    assert len(doc["queries"]) == len(bench.HEADLINE)  # never truncated
    assert doc["clean"] is False  # loadavg 11 + contended runs
    assert doc["contention_max"] == 0.1234
    # either everything fit, or the drop is declared
    kept = len(doc["contention"]) + doc.get("contention_dropped", 0)
    assert kept == len(bench.HEADLINE)


def test_emit_line_clean_suite_drops_contention_noise():
    """On a quiet box the per-query dict filters to empty — the
    contention_max scalar carries the story — and clean flips true."""
    timings, contention = _real_suite(contended=False)
    line = bench.emit_line(timings, contention, "0.1", 0.02, 32)
    assert len(line) < 1700  # comfortably inside the window
    doc = json.loads(line)
    assert doc["clean"] is True
    assert doc["contention"] == {}
    assert doc["contention_max"] == 0.0003
    assert doc["value"] == round(123.456 * len(bench.HEADLINE), 3)
    assert doc["sf"] == 0.1


def test_emit_line_handles_missing_loadavg():
    """loadavg_start None (os.getloadavg unavailable) must serialize
    and read as not-provably-clean."""
    timings = {"q1_pricing_summary": 1.0}
    doc = json.loads(
        bench.emit_line(timings, {"q1_pricing_summary": 0.0}, "0.001", None, 32)
    )
    assert doc["loadavg_start"] is None
    assert doc["clean"] is False


def test_emit_line_drops_contention_entirely_before_overflowing():
    """If the top-8 degradation still overflows (longer query names in
    a future suite), the emitter drops the contention detail entirely —
    contention_max + clean survive and the line parses — instead of
    dying on a guard that `python -O` would strip anyway."""
    names = [f"future_query_with_a_much_longer_name_{i:02d}_" + "x" * 90
             for i in range(8)]
    timings = {n: 123.456 for n in names}
    contention = {n: 0.1234 for n in names}
    line = bench.emit_line(timings, contention, "0.1", 0.5, 32)
    assert len(line) < 1800
    doc = json.loads(line)
    assert doc["contention"] == {}
    assert doc["contention_dropped"] == len(names)
    assert doc["contention_max"] == 0.1234
    assert len(doc["queries"]) == len(names)  # timings never truncated


def test_emit_line_raises_loudly_when_even_degraded_line_overflows():
    """A line that cannot fit even with contention gone raises an
    explicit RuntimeError (assert would vanish under python -O and
    reproduce the r14 parsed-null loss silently)."""
    import pytest

    names = [f"q{i:03d}_" + "y" * 100 for i in range(40)]
    timings = {n: 123.456 for n in names}
    contention = {n: 0.0001 for n in names}
    with pytest.raises(RuntimeError, match="capture window"):
        bench.emit_line(timings, contention, "0.1", 0.5, 32)
