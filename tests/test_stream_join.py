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
