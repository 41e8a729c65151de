from __future__ import annotations

from datetime import datetime

from udacity_data_engineering_spark.etl.scd2 import current_view, scd2_apply

T0 = datetime(2024, 1, 1)
T1 = datetime(2024, 2, 1)
T2 = datetime(2024, 3, 1)


def test_scd2_versions_chain(spark):
    dim = spark.createDataFrame(
        [(1, "free", T0, None), (2, "free", T0, None)],
        "user_id long, level string, valid_from timestamp_ntz, valid_to timestamp_ntz",
    )
    changes = spark.createDataFrame(
        [(1, "paid", T1), (1, "free", T2), (3, "paid", T1)],
        "user_id long, level string, ts timestamp_ntz",
    )
    out = scd2_apply(dim, changes, "user_id")
    rows = {
        (r.user_id, r.level, r.valid_from, r.valid_to) for r in out.collect()
    }
    assert rows == {
        (1, "free", T0, T1),   # closed by first change
        (1, "paid", T1, T2),   # intermediate version, closed by next
        (1, "free", T2, None), # current
        (2, "free", T0, None), # untouched key stays open
        (3, "paid", T1, None), # brand-new key
    }
    current = {
        (r.user_id, r.level) for r in current_view(out).collect()
    }
    assert current == {(1, "free"), (2, "free"), (3, "paid")}


def test_scd2_asof_fact_join(spark):
    """The point of SCD2: facts join to the version valid at event time."""
    from udacity_data_engineering_spark.operators.asof import asof_join

    dim = scd2_apply(
        spark.createDataFrame(
            [(1, "free", T0, None)],
            "user_id long, level string, valid_from timestamp_ntz, valid_to timestamp_ntz",
        ),
        spark.createDataFrame(
            [(1, "paid", T1)], "user_id long, level string, ts timestamp_ntz"
        ),
        "user_id",
    )
    facts = spark.createDataFrame(
        [(1, datetime(2024, 1, 15), 100), (1, datetime(2024, 2, 15), 101)],
        "user_id long, ts timestamp_ntz, fact_id long",
    )
    joined = asof_join(
        facts,
        dim.select("user_id", "level", "valid_from"),
        on="user_id",
        left_ts="ts",
        right_ts="valid_from",
        right_cols=("level",),
    )
    got = {(r.fact_id, r.level_matched) for r in joined.collect()}
    assert got == {(100, "free"), (101, "paid")}
