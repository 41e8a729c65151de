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
