

def test_resample_ffill_known_grid(spark):
    """Hand-checkable grid: 3 observations across 3 hours -> 4 hourly
    points (trunc(min)..trunc(max)), each carrying the latest value at
    or before it; the pre-first-observation point carries the value
    observed within its own hour (trunc rounds the grid start down)."""
    from datetime import datetime

    from udacity_data_engineering_spark.operators.asof import resample_ffill

    rows = [
        (1, 10, datetime(2024, 1, 1, 0, 30), 1.0),
        (2, 10, datetime(2024, 1, 1, 1, 15), 2.0),
        (3, 10, datetime(2024, 1, 1, 3, 45), 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        r["grid_ts"].hour: r["value"]
        for r in resample_ffill(
            df, "user_id", "ts", "value", tiebreak="event_id"
        ).collect()
    }
    # grid 00:00..03:00; 00:00 precedes the first observation -> NULL
    assert out == {0: None, 1: 1.0, 2: 2.0, 3: 2.0}


def test_resample_ffill_tie_takes_max_tiebreak(spark):
    from datetime import datetime

    from udacity_data_engineering_spark.operators.asof import resample_ffill

    t = datetime(2024, 1, 1, 0, 30)
    df = spark.createDataFrame(
        [
            (1, 10, t, 1.0),
            (2, 10, t, 2.0),
            (3, 10, datetime(2024, 1, 1, 1, 30), 9.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        r["grid_ts"].hour: r["value"]
        for r in resample_ffill(
            df, "user_id", "ts", "value", tiebreak="event_id"
        ).collect()
    }
    # 01:00 sees the tied pair at 00:30 -> max event_id (value 2.0) wins
    assert got == {0: None, 1: 2.0}


def test_resample_step_validation():
    import pytest as _pt

    from udacity_data_engineering_spark.operators.asof import _step_unit

    assert _step_unit("1 hour") == "hour"
    assert _step_unit("1 days") == "day"
    with _pt.raises(ValueError, match="shorthand"):
        _step_unit("1h")
    with _pt.raises(ValueError, match="count must be 1"):
        _step_unit("30 minutes")
    with _pt.raises(ValueError, match="unsupported resample unit"):
        _step_unit("1 fortnight")


def test_interval_join_equals_naive_and_emits_once(spark):
    """Binned overlap join == naive crossJoin+filter, with each pair
    emitted exactly once even when intervals span many cells."""
    import random

    from udacity_data_engineering_spark.operators.asof import (
        interval_join_binned,
    )

    rng = random.Random(13)
    lrows = []
    for i in range(60):
        s = rng.randrange(0, 200)
        lrows.append((i, s, s + rng.randrange(0, 25)))  # some span >> cell
    rrows = []
    for j in range(40):
        s = rng.randrange(0, 200)
        rrows.append((j, s, s + rng.randrange(0, 12)))
    left = spark.createDataFrame(lrows, "lid long, ls long, le long")
    right = spark.createDataFrame(rrows, "rid long, rs long, re long")

    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_join_binned(
            left, right, "ls", "le", "rs", "re", cell=5
        ).collect()
    )
    want = sorted(
        (lr[0], rr[0])
        for lr in lrows
        for rr in rrows
        if lr[1] <= rr[2] and rr[1] <= lr[2]
    )
    assert got == want  # equality implies no duplicate emissions


def test_interval_join_rejects_bad_cell(spark):
    import pytest

    from udacity_data_engineering_spark.operators.asof import (
        interval_join_binned,
    )

    df = spark.createDataFrame([(1, 2)], "s long, e long")
    with pytest.raises(ValueError):
        interval_join_binned(df, df, "s", "e", "s", "e", cell=0)
    with pytest.raises(ValueError, match="max_cells_per_interval"):
        interval_join_binned(
            df, df, "s", "e", "s", "e", cell=5, max_cells_per_interval=1
        )


def test_interval_join_cell_explosion_fails_loudly(spark):
    """ADVICE/VERDICT r13: a `cell` far below the real interval lengths
    used to silently blow each interval into k+1 rows; now any interval
    exploding past max_cells_per_interval fails the job with the
    offending cell count, the in_cap_groups/fail_on_drops discipline."""
    import pytest

    from udacity_data_engineering_spark.operators.asof import (
        interval_join_binned,
    )

    left = spark.createDataFrame(
        [(1, 0, 5), (2, 10, 10_000)], "lid long, ls long, le long"
    )
    right = spark.createDataFrame([(1, 3, 7)], "rid long, rs long, re long")
    with pytest.raises(Exception, match="explodes into .* grid cells"):
        interval_join_binned(
            left, right, "ls", "le", "rs", "re", cell=5,
            max_cells_per_interval=64,
        ).collect()
    # raising the cap deliberately lets the same data through
    got = interval_join_binned(
        left, right, "ls", "le", "rs", "re", cell=5,
        max_cells_per_interval=4096,
    ).count()
    assert got == 1  # only (lid=1, rid=1) overlaps


def test_interval_join_derives_cell_from_lengths(spark):
    """cell=None derives the grid from the p90 interval length, so the
    typical interval explodes into <= 2 cells and the adversarial caller
    who can't guess a width gets a safe default instead of a blow-up."""
    from udacity_data_engineering_spark.operators.asof import (
        derive_interval_cell,
        interval_join_binned,
    )

    lrows = [(i, 10 * i, 10 * i + 20) for i in range(50)]
    rrows = [(j, 10 * j + 5, 10 * j + 28) for j in range(50)]
    left = spark.createDataFrame(lrows, "lid long, ls long, le long")
    right = spark.createDataFrame(rrows, "rid long, rs long, re long")
    cell = derive_interval_cell(left, right, "ls", "le", "rs", "re")
    assert 20 <= cell <= 30  # ~p90 of the 20/23-length mix, +1
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_join_binned(
            left, right, "ls", "le", "rs", "re", cell=None
        ).collect()
    )
    want = sorted(
        (lr[0], rr[0])
        for lr in lrows
        for rr in rrows
        if lr[1] <= rr[2] and rr[1] <= lr[2]
    )
    assert got == want
