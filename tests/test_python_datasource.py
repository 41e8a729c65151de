"""Spark 4 custom Python data source: parallel batch read and the
rate-like streaming reader (offset slices + deterministic replay)."""

from __future__ import annotations

from udacity_data_engineering_spark.sources.python_datasource import (
    _row,
    register_synth_source,
)


def test_batch_read_is_partitioned_and_exact(spark):
    register_synth_source(spark)
    df = spark.read.format("synthdocs").option("n", 200).option("parts", 4).load()
    assert df.rdd.getNumPartitions() == 4
    got = sorted(tuple(r) for r in df.collect())
    assert got == [_row(i) for i in range(200)]


def test_stream_read_advances_offsets_and_replays(spark, tmp_path):
    register_synth_source(spark)
    stream = (
        spark.readStream.format("synthdocs")
        .option("rows_per_batch", 50)
        .option("max_rows", 150)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM synth_sink").collect()
    )
    # bounded at max_rows across >= 2 micro-batches, every emitted row
    # equal to the deterministic generator's output — replay of any
    # slice regenerates identical rows
    assert rows == [_row(i) for i in range(150)]
