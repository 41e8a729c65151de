"""SCD Type-2 build + incremental apply (operators/scd.py).

The load-bearing property: apply(build(history), batch) must equal
build(history ∪ batch) for any batch strictly after history — that is
what lets the daily dim job cost |dim|+|batch| instead of |history|.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.scd import scd2_apply, scd2_build

COLS = "user_id long, event_id long, ts timestamp_ntz"


def _t(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _rows(df):
    return {
        (r.user_id, r.event_id, r.valid_from, r.valid_to, r.is_current)
        for r in df.collect()
    }


def test_build_chains_versions_and_flags_current(spark):
    changes = spark.createDataFrame(
        [(1, 10, _t(1)), (1, 11, _t(3)), (2, 20, _t(2))], COLS
    )
    got = _rows(scd2_build(changes))
    assert got == {
        (1, 10, _t(1), _t(3), False),
        (1, 11, _t(3), None, True),
        (2, 20, _t(2), None, True),
    }


def test_build_tiebreak_makes_same_instant_changes_deterministic(spark):
    changes = spark.createDataFrame(
        [(1, 12, _t(5)), (1, 11, _t(5)), (1, 13, _t(6))], COLS
    )
    got = _rows(scd2_build(changes))
    # same-ts versions order by event_id; valid_to of 11 is 12's ts
    assert got == {
        (1, 11, _t(5), _t(5), False),
        (1, 12, _t(5), _t(6), False),
        (1, 13, _t(6), None, True),
    }


def test_apply_equals_from_scratch_rebuild(spark):
    # 3 keys x several versions straddling the cutoff; key 4 batch-only,
    # key 2 history-only — the full shape matrix in one frame
    rows = [
        (1, 10, _t(1)),
        (1, 11, _t(4)),
        (2, 20, _t(2)),
        (3, 30, _t(3)),
        (1, 12, _t(10)),
        (3, 31, _t(11)),
        (3, 32, _t(12)),
        (4, 40, _t(13)),
    ]
    changes = spark.createDataFrame(rows, COLS)
    cutoff = F.lit("2024-01-08").cast("timestamp_ntz")
    dim = scd2_build(changes.filter(F.col("ts") < cutoff))
    incremental = scd2_apply(dim, changes.filter(F.col("ts") >= cutoff))
    assert _rows(incremental) == _rows(scd2_build(changes))


def test_apply_leaves_unchanged_keys_untouched_and_inserts_new(spark):
    dim = scd2_build(
        spark.createDataFrame([(2, 20, _t(2)), (2, 21, _t(3))], COLS)
    )
    batch = spark.createDataFrame([(9, 90, _t(9))], COLS)
    got = _rows(scd2_apply(dim, batch))
    assert (2, 20, _t(2), _t(3), False) in got  # closed stays closed
    assert (2, 21, _t(3), None, True) in got  # untouched current stays open
    assert (9, 90, _t(9), None, True) in got  # new key inserted current
    assert len(got) == 3


def test_point_in_time_interval_semantics(spark):
    """PIT == explicit interval join for contiguous SCD2 intervals,
    including zero-width supersession and pre-history facts."""
    from udacity_data_engineering_spark.operators.scd import (
        scd2_build,
        scd2_point_in_time,
    )

    changes = spark.createDataFrame(
        [
            # user 1: versions at t=10 (e1), t=20 (e2); duplicate instant
            # at t=20 (e3 supersedes e2 — zero-width interval for e2)
            (1, 10, 1, "a"),
            (1, 20, 2, "b"),
            (1, 20, 3, "c"),
            # user 2: single version at t=100
            (2, 100, 4, "d"),
        ],
        "user_id long, ts long, event_id long, attr string",
    )
    dim = scd2_build(changes)
    facts = spark.createDataFrame(
        [
            (1, 5, 100),   # before history -> NULL
            (1, 10, 101),  # exactly first valid_from -> e1
            (1, 15, 102),  # inside [10, 20) -> e1
            (1, 20, 103),  # at the duplicate instant -> e3 (supersedes e2)
            (1, 99, 104),  # open interval -> e3
            (2, 99, 105),  # before user 2's history -> NULL
            (2, 100, 106), # at valid_from -> e4
        ],
        "user_id long, ts long, fact_id long",
    )
    out = scd2_point_in_time(
        facts,
        dim.select("user_id", "valid_from", "event_id", "attr"),
        attrs=("event_id", "attr"),
        tiebreak="event_id",
    )
    got = {r["fact_id"]: r["event_id_matched"] for r in out.collect()}
    assert got == {100: None, 101: 1, 102: 1, 103: 3, 104: 3, 105: None, 106: 4}
