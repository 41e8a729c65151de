"""Stream-stream interval join parity: the watermarked streaming join's
availableNow replay must equal the identical batch join."""

from __future__ import annotations

from udacity_data_engineering_spark.session import table
from udacity_data_engineering_spark.streaming.event_stream import stream_events
from udacity_data_engineering_spark.streaming.joins import purchases_after_signup


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4).write.parquet(src)

    stream = purchases_after_signup(stream_events(spark, src))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("ss_join_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.signup_ts, r.purchase_ts, r.value)
        for r in spark.sql("SELECT * FROM ss_join_sink").collect()
    )

    # batch equivalent: ts is TIMESTAMP in the stream (watermark
    # requirement) vs NTZ in the batch loader — wall-clock equal under
    # the pinned UTC session, so tuples compare equal
    ev = table(spark, sf_dir, "events")
    batch = purchases_after_signup.__wrapped__ if hasattr(
        purchases_after_signup, "__wrapped__"
    ) else purchases_after_signup
    want_df = batch(ev.withColumnRenamed("ts", "ts").selectExpr(
        "user_id", "cast(ts as timestamp) as ts", "event_type", "value"
    ))
    want = sorted(
        (r.user_id, r.signup_ts, r.purchase_ts, r.value)
        for r in want_df.collect()
    )
    assert got == want
    assert len(got) > 0


def test_outer_stream_join_nulls_respect_watermark(spark, sf_dir, tmp_path):
    """LEFT OUTER stream-stream join: matched rows equal the batch join;
    a no-conversion null row may exist ONLY for signups whose join window
    the purchase watermark has fully passed, and every clearly-closed
    window must have emitted one. Pins the late-complete boundary the
    operator's docstring promises."""
    import datetime

    from pyspark.sql import functions as F

    from udacity_data_engineering_spark.streaming.joins import (
        signups_with_conversion,
    )

    src = str(tmp_path / "outer_in")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4).write.parquet(src)

    stream = signups_with_conversion(stream_events(spark, src))
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("ss_outer_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "outer_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM ss_outer_sink").collect()
    got_matched = sorted(
        (r.user_id, r.signup_ts, r.purchase_ts, r.value)
        for r in got
        if r.purchase_ts is not None
    )
    got_nulls = sorted((r.user_id, r.signup_ts) for r in got if r.purchase_ts is None)

    ev = table(spark, sf_dir, "events").selectExpr(
        "user_id", "cast(ts as timestamp) as ts", "event_type", "value"
    )
    want_df = signups_with_conversion(ev)  # watermark is a no-op in batch
    want_matched = sorted(
        (r.user_id, r.signup_ts, r.purchase_ts, r.value)
        for r in want_df.collect()
        if r.purchase_ts is not None
    )
    batch_nulls = {
        (r.user_id, r.signup_ts) for r in want_df.collect() if r.purchase_ts is None
    }

    # 1) conversions: exact batch parity
    assert got_matched == want_matched and len(got_matched) > 0

    # 2) every emitted null is a true non-conversion whose window closed.
    # The GLOBAL watermark is the MIN across both sides' watermarks
    # (Spark's multipleWatermarkPolicy default), so the boundary follows
    # whichever side's max event time is older.
    maxes = {
        r.event_type: r.m
        for r in ev.filter("event_type in ('purchase', 'signup')")
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .collect()
    }
    wm = min(maxes.values()) - datetime.timedelta(hours=2)
    # signup_ts + within <= wm, minus 1s slack for internal ms rounding
    closed = wm - datetime.timedelta(hours=1, seconds=1)
    assert set(got_nulls) <= batch_nulls
    assert all(ts <= wm for _, ts in got_nulls), "null emitted before window closed"

    # 3) completeness: every non-conversion clearly inside the closed
    # region was emitted
    must_emit = {(u, ts) for u, ts in batch_nulls if ts < closed}
    assert must_emit <= set(got_nulls), (
        f"missing {sorted(must_emit - set(got_nulls))[:5]}"
    )
    assert len(must_emit) > 0
