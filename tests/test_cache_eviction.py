"""Session-cache eviction contract (pq._evict_put / _release).

The ADVICE r11 failure: _evict_put's eviction path assumed every cached
value is a (df, meta) 2-tuple; ensemble.py caches a plain dict of frames,
so the FIRST eviction of a dict value (a third (appId, sf_dir) key in one
session, e.g. a single-session sweep over sf0.001/0.01/0.1) raised
ValueError and crashed q_neardup_ensemble/q_ensemble_survivors. _release
now walks any tuple/list/dict nesting. Pure-python test — no Spark.
"""

from __future__ import annotations

from udacity_data_engineering_spark.operators.pq import _evict_put, _release


class FakeFrame:
    def __init__(self):
        self.unpersisted = 0

    def unpersist(self):
        self.unpersisted += 1


class AngryFrame(FakeFrame):
    def unpersist(self):
        super().unpersist()
        raise RuntimeError("session already stopped")


def test_release_walks_tuples_lists_dicts():
    a, b, c = FakeFrame(), FakeFrame(), FakeFrame()
    _release((a, [b, {"x": c, "model": [[1.0, 2.0]]}], "meta", 3))
    assert (a.unpersisted, b.unpersisted, c.unpersisted) == (1, 1, 1)


def test_release_swallows_unpersist_errors():
    a = AngryFrame()
    _release([a])  # must not raise
    assert a.unpersisted == 1


def test_evict_put_evicts_dict_values():
    # the exact ADVICE scenario: third key evicts a DICT-valued entry
    cache: dict = {}
    first = {"members": FakeFrame(), "rep_pairs": FakeFrame()}
    _evict_put(cache, "k1", first)
    _evict_put(cache, "k2", (FakeFrame(), ["centroid"]))
    _evict_put(cache, "k3", {"frames": FakeFrame()})  # evicts k1
    assert list(cache) == ["k2", "k3"]
    assert all(f.unpersisted == 1 for f in first.values())


def test_evict_put_evicts_tuple_values():
    cache: dict = {}
    df1, df2 = FakeFrame(), FakeFrame()
    _evict_put(cache, "k1", (df1, [[0.0]]))
    _evict_put(cache, "k2", (df2, [[1.0]]))
    _evict_put(cache, "k3", (FakeFrame(), None))
    assert list(cache) == ["k2", "k3"]
    assert df1.unpersisted == 1 and df2.unpersisted == 0


def test_ensemble_operating_point_guard():
    from udacity_data_engineering_spark.operators.ensemble import (
        _check_operating_point,
    )
    import pytest

    # no state / no recorded point: caller owns consistency
    _check_operating_point(None, 0.9, 0.9, True)
    _check_operating_point({"rep_pairs": None}, 0.9, 0.9, True)
    # matching point: fine
    _check_operating_point({"operating_point": (0.5, 0.4, False)}, 0.5, 0.4, False)
    # divergent thresholds with frozen state: must refuse
    with pytest.raises(ValueError, match="operating"):
        _check_operating_point(
            {"operating_point": (0.5, 0.4, False)}, 0.7, 0.4, False
        )
