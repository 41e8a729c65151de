"""bench.py import/contract guard: the driver runs bench.py unsupervised
per round, so a syntax error or a broken stock-A/B leg must surface in
pytest first, not in the driver log."""

from __future__ import annotations

import importlib


def test_bench_imports_and_stock_leg_is_skippable(monkeypatch):
    bench = importlib.import_module("bench")
    # the env kill-switch must short-circuit BEFORE any subprocess spawn
    monkeypatch.setenv("SPARK_GRAFT_NO_AB", "1")
    assert bench.measure_stock() is None
    # the headline bench set and the extension list are plain data the
    # driver depends on — importable without a SparkSession
    assert callable(bench.main)
    assert bench.REPS >= 1


def test_measure_stock_failure_returns_none(monkeypatch):
    """A broken baseline script must degrade to engine-only output,
    never kill the bench."""
    import bench

    monkeypatch.delenv("SPARK_GRAFT_NO_AB", raising=False)
    monkeypatch.setattr(
        "sys.executable", "/nonexistent/python-for-this-test"
    )
    assert bench.measure_stock() is None


def test_slim_output_fits_driver_capture_window():
    """The driver keeps only the last ~2000 chars of bench stdout;
    BENCH_r07/r08 recorded parsed=null because the grown extension map
    pushed the line past that. The printed line must stay comfortably
    inside the window with realistic headline/stock maps."""
    import json

    import bench

    out = {
        "metric": "headline_query_total",
        "value": 3.03,
        "unit": "sec",
        "queries": {f"a_headline_query_name_{i}": 0.123 for i in range(10)},
        "extensions": {f"q_some_extension_{i}": 1.234 for i in range(80)},
        "sf": "0.1",
        "cpus": 32,
        "stock_queries": {f"stock_query_name_{i}": 0.456 for i in range(10)},
        "stock_total": 6.019,
        "vs_stock": 0.649,
    }
    out["bench_attempts"] = [
        {"queries": out["queries"], "stock_queries": out["stock_queries"],
         "loadavg_after_engine_leg": 31.2}
        for _ in range(2)
    ]
    line = json.dumps(bench.slim_output(out))
    assert len(line) < 1500, len(line)
    parsed = json.loads(line)
    assert "extensions" not in parsed
    assert "bench_attempts" not in parsed
    assert parsed["n_extensions"] == 80
    assert parsed["extensions_total"] == round(1.234 * 80, 3)
    assert parsed["value"] == 3.03 and parsed["vs_stock"] == 0.649


def test_contention_retry_band_and_merge():
    """VERDICT r13 task 1: the driver's r13 artifact read vs_stock=2.62
    from one-sided host contention while three same-box runs read
    0.57-0.70. The harness must (a) flag a ratio outside the plausible
    band for a same-run retry, (b) NOT flag ratios inside the observed
    0.58-0.82 jitter band, and (c) merge attempts by per-query minimum so
    a contended attempt can only be overridden downward, never upward."""
    import bench

    # (a) the r13 failure signature and its mirror both trigger
    assert bench.needs_retry(2.62)
    assert bench.needs_retry(0.30)
    # (b) the entire observed quiet-host band does not
    for ok in (0.58, 0.64, 0.70, 0.82, 0.90):
        assert not bench.needs_retry(ok), ok
    assert not bench.needs_retry(None)  # no stock leg -> nothing to judge

    # (c) merge: uniform 3x contention on attempt 1, quiet attempt 2
    quiet = {"scan": 0.1, "join": 0.4, "write": 0.6}
    contended = {k: round(v * 3, 3) for k, v in quiet.items()}
    merged = bench.merge_best(contended, quiet)
    assert merged == quiet
    # order-insensitive, and a failed retry (None/{}) is a no-op
    assert bench.merge_best(quiet, contended) == quiet
    assert bench.merge_best(contended, None, {}) == contended
    # mixed: each query independently takes its own minimum
    a = {"x": 1.0, "y": 9.0}
    b = {"x": 5.0, "y": 2.0, "z": 7.0}
    assert bench.merge_best(a, b) == {"x": 1.0, "y": 2.0, "z": 7.0}
