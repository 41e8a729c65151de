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
    line = json.dumps(bench.slim_output(out))
    assert len(line) < 1500, len(line)
    parsed = json.loads(line)
    assert "extensions" not in parsed
    assert parsed["n_extensions"] == 80
    assert parsed["extensions_total"] == round(1.234 * 80, 3)
    assert parsed["value"] == 3.03 and parsed["vs_stock"] == 0.649
