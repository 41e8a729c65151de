

def test_sketch_rollup_merge_is_exact_union_and_bounded_error(spark):
    """HLL union = per-register maxima, so merging per-day sketches
    must yield the IDENTICAL estimate to sketching the whole corpus in
    one pass (determinism of the rollup-table pattern), and both must
    sit within the published ~1.6% (lg_k=12) error of the exact count
    — asserted with a conservative 5% gate."""
    from pyspark.sql import functions as F

    from udacity_data_engineering_spark.operators.aggregates import (
        sketch_merge_estimate,
        sketch_rollup,
    )

    rows = [
        (d % 7, "click" if d % 3 else "view", d % 997)
        for d in range(20000)
    ]
    df = spark.createDataFrame(rows, "day int, event_type string, user_id long")

    daily = sketch_rollup(df, ["day", "event_type"], "user_id")
    merged = {
        r.event_type: r.approx_distinct
        for r in sketch_merge_estimate(daily, ["event_type"]).collect()
    }
    direct = {
        r.event_type: r.approx_distinct
        for r in sketch_merge_estimate(
            sketch_rollup(df, ["event_type"], "user_id"), ["event_type"]
        ).collect()
    }
    assert merged == direct  # union-of-sketches == sketch-of-union

    exact = {
        r.event_type: r.n
        for r in df.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, est in merged.items():
        assert abs(est - exact[et]) / exact[et] < 0.05, (et, est, exact[et])
