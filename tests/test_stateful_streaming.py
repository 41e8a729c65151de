"""applyInPandasWithState + foreachBatch: the custom stateful operator's
replay result must equal the batch aggregate, and state must carry
across micro-batches."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from udacity_data_engineering_spark.session import table
from udacity_data_engineering_spark.streaming.event_stream import stream_events
from udacity_data_engineering_spark.streaming.stateful import (
    running_user_totals,
    write_stream_parquet,
)


def test_stateful_totals_match_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(3).write.parquet(src)

    out = running_user_totals(stream_events(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("totals_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode may emit a row per micro-batch per user: keep the last
    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.sql(
            """SELECT user_id, n_events, sum_value FROM (
                   SELECT *, row_number() OVER (
                       PARTITION BY user_id ORDER BY n_events DESC) rn
                   FROM totals_sink) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.n, round(r.s, 2))
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


def test_state_carries_across_batches(spark, tmp_path):
    """Two availableNow replays over a growing directory: the second run
    resumes from the checkpoint and its state includes the first run's
    rows."""
    src = str(tmp_path / "grow")
    ckpt = str(tmp_path / "ckpt2")
    spark.createDataFrame([(1, 10.0), (1, 5.0)], "user_id long, value double").write.mode(
        "append"
    ).parquet(src)

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    sink_dir = str(tmp_path / "sink")

    def run_once():
        # memory sink can't recover from a checkpoint; foreachBatch can —
        # which is also the production restart story
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(sink_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(sink_dir).orderBy(F.col("n_events").desc()).collect()
    assert first[0].n_events == 2

    spark.createDataFrame([(1, 1.0)], "user_id long, value double").write.mode(
        "append"
    ).parquet(src)
    run_once()
    final = spark.read.parquet(sink_dir).orderBy(F.col("n_events").desc()).collect()
    assert final[0].n_events == 3  # 2 from run 1's state + 1 new
    assert final[0].sum_value == 16.0


def test_foreachbatch_parquet_sink(spark, sf_dir, tmp_path):
    src = str(tmp_path / "in2")
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(100).write.parquet(src)
    out = str(tmp_path / "out")
    stream = stream_events(spark, src).select("event_id", "user_id", "value")
    write_stream_parquet(stream, out, str(tmp_path / "ckpt3"))
    assert spark.read.parquet(out).count() == 100
    shutil.rmtree(src, ignore_errors=True)


def test_stream_merge_into_upserts_and_replays(spark, tmp_path):
    """CDC upsert sink: per-key last-writer-wins across micro-batches,
    and a full replay (fresh checkpoint, same inputs) converges to the
    same target instead of duplicating."""
    import pyspark.sql.functions as F

    from udacity_data_engineering_spark.streaming.stateful import stream_merge_into

    src = tmp_path / "src"
    target = str(tmp_path / "target")
    # seed target + two change files (file = micro-batch under availableNow)
    spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0)], "k long, v string, seq long"
    ).write.parquet(target)
    src.mkdir()
    spark.createDataFrame([(2, "b2", 1), (3, "c", 1)], "k long, v string, seq long") \
        .coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))
    spark.createDataFrame([(3, "c2", 2), (4, "d", 2)], "k long, v string, seq long") \
        .coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))

    stream = spark.readStream.schema("k long, v string, seq long").parquet(
        f"{src}/*"
    )
    stream_merge_into(stream, target, ["k"], str(tmp_path / "ckpt"), order_col="seq")
    got = {r.k: (r.v, r.seq) for r in spark.read.parquet(target).collect()}
    assert got == {1: ("a", 0), 2: ("b2", 1), 3: ("c2", 2), 4: ("d", 2)}

    # replay everything with a new checkpoint: same end state
    stream2 = spark.readStream.schema("k long, v string, seq long").parquet(f"{src}/*")
    stream_merge_into(stream2, target, ["k"], str(tmp_path / "ckpt2"), order_col="seq")
    again = {r.k: (r.v, r.seq) for r in spark.read.parquet(target).collect()}
    assert again == got


def test_stream_merge_into_stale_batch_cannot_regress(spark, tmp_path):
    """An out-of-order redelivery of ONLY an old batch must not overwrite
    newer target rows."""
    from udacity_data_engineering_spark.streaming.stateful import stream_merge_into

    target = str(tmp_path / "target")
    spark.createDataFrame([(3, "c2", 2)], "k long, v string, seq long").write.parquet(target)
    stale = tmp_path / "stale"
    stale.mkdir()
    spark.createDataFrame([(3, "c", 1), (5, "e", 1)], "k long, v string, seq long") \
        .coalesce(1).write.mode("overwrite").parquet(str(stale / "f1"))
    stream = spark.readStream.schema("k long, v string, seq long").parquet(f"{stale}/*")
    stream_merge_into(stream, target, ["k"], str(tmp_path / "ck"), order_col="seq")
    got = {r.k: (r.v, r.seq) for r in spark.read.parquet(target).collect()}
    assert got == {3: ("c2", 2), 5: ("e", 1)}  # key 3 kept newer, key 5 inserted


def test_transform_with_state_matches_batch(spark, sf_dir, tmp_path):
    """Spark 4 transformWithStateInPandas parity: same cumulative totals
    as the batch groupBy (and as the applyInPandasWithState variant),
    over the RocksDB state store.

    google.protobuf comes from vendor/protobuf_shim (wired in conftest
    before the JVM starts, so workers inherit it via PYTHONPATH);
    importorskip only fires where even the shim has no runtime to
    bridge to.
    """
    import pytest

    pytest.importorskip("google.protobuf")
    from udacity_data_engineering_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        running_user_totals_tws,
    )

    src = str(tmp_path / "tws_in")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(3).write.parquet(src)

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        out = running_user_totals_tws(stream_events(spark, src))
        q = (
            out.writeStream.format("memory")
            .queryName("tws_sink")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    got = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.sql(
            """SELECT user_id, n_events, sum_value FROM (
                   SELECT *, row_number() OVER (
                       PARTITION BY user_id ORDER BY n_events DESC) rn
                   FROM tws_sink) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.n, round(r.s, 2))
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# transformWithState TTL eviction (expiring_user_sessions_tws): event-time
# timers must close quiet keys' sessions and CLEAR their state
# ---------------------------------------------------------------------------


def _ttl_feed(feed_dir, batches):
    """Write one parquet file per batch with strictly increasing mtimes
    so the file stream consumes them in order."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(feed_dir, exist_ok=True)
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    for i, rows in enumerate(batches):
        t = pa.Table.from_pylist(
            [
                {
                    "event_id": j,
                    "ts": pd.Timestamp(ts),
                    "user_id": u,
                    "event_type": "x",
                    "value": v,
                    "props": "{}",
                }
                for j, (ts, u, v) in enumerate(rows)
            ],
            schema=schema,
        )
        p = os.path.join(feed_dir, f"{i:02d}.parquet")
        pq.write_table(t, p)
        os.utime(p, (1_000_000_000 + i, 1_000_000_000 + i))


def _run_ttl(spark, feed_dir, ckpt, sink, ttl_seconds=86_400):
    from udacity_data_engineering_spark.streaming.event_stream import (
        run_available_now,
    )
    from udacity_data_engineering_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        ensure_tws_runtime,
        expiring_user_sessions_tws,
    )

    assert ensure_tws_runtime(spark)
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        stream = stream_events(
            spark, feed_dir, max_files_per_trigger=1
        ).withWatermark("ts", "0 seconds")
        run_available_now(
            expiring_user_sessions_tws(stream, ttl_seconds),
            sink,
            ckpt,
            output_mode="update",
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    rows = sorted(
        (r.user_id, str(r.session_start), r.n_events, r.sum_value)
        for r in spark.table(sink).collect()
    )
    spark.catalog.dropTempView(sink)
    return rows


def test_ttl_timer_evicts_quiet_key(spark, tmp_path):
    """User 7 appears ONLY in batch 0 and never again; only the event-time
    TIMER can emit its session (no later input row for that key exists to
    trigger the arrival-gap path). User 8's events advance the watermark
    past 7's expiry across real micro-batches."""
    feed = str(tmp_path / "feed")
    _ttl_feed(
        feed,
        [
            [("2024-01-01 00:00:00", 7, 1.0), ("2024-01-01 01:00:00", 7, 2.0)],
            [("2024-01-01 20:00:00", 8, 5.0)],
            [("2024-01-02 12:00:00", 8, 5.0)],  # wm passes 7's expiry 01-02 01:00
        ],
    )
    rows = _run_ttl(spark, feed, str(tmp_path / "ck"), "ttl_timer_sink")
    assert rows == [(7, "2024-01-01 00:00:00", 2, 3.0)]


def test_ttl_eviction_clears_state_fresh_session(spark, tmp_path):
    """After the timer evicts user 7's state, a later event for 7 must
    start a FRESH session (counts reset) — proving the state was cleared,
    not merely emitted. A far-future sentinel (user 99) flushes every
    open session so both of 7's sessions are observable."""
    feed = str(tmp_path / "feed")
    _ttl_feed(
        feed,
        [
            [("2024-01-01 00:00:00", 7, 1.0), ("2024-01-01 01:00:00", 7, 2.0)],
            [("2024-01-02 12:00:00", 8, 5.0)],  # timer fires for 7 here/next
            [("2024-01-05 00:00:00", 7, 9.0)],  # post-eviction return
            [("2024-03-01 00:00:00", 99, 0.0)],  # sentinel: flush all
        ],
    )
    rows = _run_ttl(spark, feed, str(tmp_path / "ck"), "ttl_fresh_sink")
    user7 = [r for r in rows if r[0] == 7]
    assert user7 == [
        (7, "2024-01-01 00:00:00", 2, 3.0),  # evicted by timer
        (7, "2024-01-05 00:00:00", 1, 9.0),  # fresh state afterwards
    ]
    # user 8's session flushed by the sentinel too
    assert (8, "2024-01-02 12:00:00", 1, 5.0) in rows


def test_ttl_intra_batch_gap_splits_sessions(spark, tmp_path):
    """Two sessions arriving in ONE micro-batch must still split on the
    gap (the kernel sessionizes within the batch, not only across)."""
    feed = str(tmp_path / "feed")
    _ttl_feed(
        feed,
        [
            [
                ("2024-01-01 00:00:00", 7, 1.0),
                ("2024-01-03 00:00:00", 7, 2.0),  # gap 2d > ttl 1d
            ],
            [("2024-02-01 00:00:00", 99, 0.0)],  # sentinel flush
        ],
    )
    rows = _run_ttl(spark, feed, str(tmp_path / "ck"), "ttl_intra_sink")
    user7 = [r for r in rows if r[0] == 7]
    assert user7 == [
        (7, "2024-01-01 00:00:00", 1, 1.0),
        (7, "2024-01-03 00:00:00", 1, 2.0),
    ]


# ---------------------------------------------------------------------------
# transformWithState MAPSTATE (per_type_session_totals_tws): per-key
# collection state — per-event-type counters in one MapState, drained on
# session close, cleared by the same event-time timer discipline
# ---------------------------------------------------------------------------


def _map_feed(feed_dir, batches):
    """Like _ttl_feed but with a caller-chosen event_type per row:
    batches of (ts, user_id, event_type, value)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(feed_dir, exist_ok=True)
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    for i, rows in enumerate(batches):
        t = pa.Table.from_pylist(
            [
                {
                    "event_id": j,
                    "ts": pd.Timestamp(ts),
                    "user_id": u,
                    "event_type": ty,
                    "value": v,
                    "props": "{}",
                }
                for j, (ts, u, ty, v) in enumerate(rows)
            ],
            schema=schema,
        )
        p = os.path.join(feed_dir, f"{i:02d}.parquet")
        pq.write_table(t, p)
        os.utime(p, (1_000_000_000 + i, 1_000_000_000 + i))


def _run_map(spark, feed_dir, ckpt, sink, ttl_seconds=86_400):
    from udacity_data_engineering_spark.streaming.event_stream import (
        run_available_now,
    )
    from udacity_data_engineering_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        ensure_tws_runtime,
        per_type_session_totals_tws,
    )

    assert ensure_tws_runtime(spark)
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        stream = stream_events(
            spark, feed_dir, max_files_per_trigger=1
        ).withWatermark("ts", "0 seconds")
        run_available_now(
            per_type_session_totals_tws(stream, ttl_seconds),
            sink,
            ckpt,
            output_mode="update",
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    rows = sorted(
        (r.user_id, str(r.session_start), r.event_type, r.n_events, r.sum_value)
        for r in spark.table(sink).collect()
    )
    spark.catalog.dropTempView(sink)
    return rows


@pytest.mark.slow  # depth tier (~40-75 s); the default tier keeps
# the intra-batch gap, buffer-prefix, ttl and parity tests on the
# same kernels
def test_mapstate_accumulates_per_type_across_batches(spark, tmp_path):
    """Map entries for a user must carry ACROSS micro-batches (the whole
    point of MapState) and drain one row per type when the timer fires."""
    feed = str(tmp_path / "feed")
    _map_feed(
        feed,
        [
            [("2024-01-01 00:00:00", 7, "view", 1.0),
             ("2024-01-01 01:00:00", 7, "click", 2.0)],
            [("2024-01-01 02:00:00", 7, "view", 4.0)],  # same session, +view
            [("2024-03-01 00:00:00", 99, "x", 0.0)],  # sentinel: flush all
        ],
    )
    rows = _run_map(spark, feed, str(tmp_path / "ck"), "map_acc_sink")
    user7 = [r for r in rows if r[0] == 7]
    assert user7 == [
        (7, "2024-01-01 00:00:00", "click", 1, 2.0),
        (7, "2024-01-01 00:00:00", "view", 2, 5.0),
    ]


@pytest.mark.slow  # depth tier (~40-75 s); the default tier keeps
# the intra-batch gap, buffer-prefix, ttl and parity tests on the
# same kernels
def test_mapstate_eviction_clears_map(spark, tmp_path):
    """After the timer drains+clears the map, a returning user starts a
    fresh EMPTY map — counts must not leak from the evicted session."""
    feed = str(tmp_path / "feed")
    _map_feed(
        feed,
        [
            [("2024-01-01 00:00:00", 7, "view", 1.0)],
            [("2024-01-02 12:00:00", 8, "x", 5.0)],  # wm passes 7's expiry
            [("2024-01-05 00:00:00", 7, "view", 9.0)],  # post-eviction return
            [("2024-03-01 00:00:00", 99, "x", 0.0)],  # sentinel flush
        ],
    )
    rows = _run_map(spark, feed, str(tmp_path / "ck"), "map_evict_sink")
    user7 = [r for r in rows if r[0] == 7]
    assert user7 == [
        (7, "2024-01-01 00:00:00", "view", 1, 1.0),
        (7, "2024-01-05 00:00:00", "view", 1, 9.0),
    ]


def test_mapstate_intra_batch_gap_drains_mid_batch(spark, tmp_path):
    """A gap WITHIN one micro-batch must drain the session's map before
    the post-gap rows repopulate it."""
    feed = str(tmp_path / "feed")
    _map_feed(
        feed,
        [
            [
                ("2024-01-01 00:00:00", 7, "view", 1.0),
                ("2024-01-01 00:30:00", 7, "click", 2.0),
                ("2024-01-03 00:00:00", 7, "view", 8.0),  # gap 2d > ttl 1d
            ],
            [("2024-02-01 00:00:00", 99, "x", 0.0)],  # sentinel flush
        ],
    )
    rows = _run_map(spark, feed, str(tmp_path / "ck"), "map_intra_sink")
    user7 = [r for r in rows if r[0] == 7]
    assert user7 == [
        (7, "2024-01-01 00:00:00", "click", 1, 2.0),
        (7, "2024-01-01 00:00:00", "view", 1, 1.0),
        (7, "2024-01-03 00:00:00", "view", 1, 8.0),
    ]


# ---------------------------------------------------------------------------
# transformWithState LISTSTATE (session_first_k_tws): bounded ordered
# per-key buffer — the third arbitrary-state type
# ---------------------------------------------------------------------------


def _run_list(spark, feed_dir, ckpt, sink, ttl_seconds=86_400, k=2):
    from udacity_data_engineering_spark.streaming.event_stream import (
        run_available_now,
    )
    from udacity_data_engineering_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        ensure_tws_runtime,
        session_first_k_tws,
    )

    assert ensure_tws_runtime(spark)
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        stream = stream_events(
            spark, feed_dir, max_files_per_trigger=1
        ).withWatermark("ts", "0 seconds")
        run_available_now(
            session_first_k_tws(stream, ttl_seconds, k=k),
            sink,
            ckpt,
            output_mode="update",
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    rows = sorted(
        (r.user_id, str(r.session_start), r.pos, r.event_type)
        for r in spark.table(sink).collect()
    )
    spark.catalog.dropTempView(sink)
    return rows


def test_liststate_buffers_prefix_across_batches(spark, tmp_path):
    """The K-bounded buffer must persist across micro-batches: events 1-2
    arrive in batch 0, event 3 (beyond K=2) in batch 1 and must NOT be
    buffered; the timer drains exactly the first two."""
    feed = str(tmp_path / "feed")
    _map_feed(
        feed,
        [
            [("2024-01-01 00:00:00", 7, "view", 1.0),
             ("2024-01-01 01:00:00", 7, "click", 2.0)],
            [("2024-01-01 02:00:00", 7, "purchase", 3.0)],  # beyond K=2
            [("2024-03-01 00:00:00", 99, "x", 0.0)],  # sentinel flush
        ],
    )
    rows = _run_list(spark, feed, str(tmp_path / "ck"), "list_prefix_sink")
    user7 = [r for r in rows if r[0] == 7]
    assert user7 == [
        (7, "2024-01-01 00:00:00", 1, "view"),
        (7, "2024-01-01 00:00:00", 2, "click"),
    ]


@pytest.mark.slow  # depth tier (~40-75 s); the default tier keeps
# the intra-batch gap, buffer-prefix, ttl and parity tests on the
# same kernels
def test_liststate_gap_drains_and_rebuffers(spark, tmp_path):
    """An intra-stream gap must drain the buffer and start a fresh one —
    the second session's prefix is buffered from scratch."""
    feed = str(tmp_path / "feed")
    _map_feed(
        feed,
        [
            [("2024-01-01 00:00:00", 7, "view", 1.0),
             ("2024-01-01 00:10:00", 7, "click", 2.0),
             ("2024-01-01 00:20:00", 7, "purchase", 3.0)],  # dropped, K=2
            [("2024-01-05 00:00:00", 7, "signup", 9.0)],  # gap > ttl
            [("2024-03-01 00:00:00", 99, "x", 0.0)],  # sentinel flush
        ],
    )
    rows = _run_list(spark, feed, str(tmp_path / "ck"), "list_gap_sink")
    user7 = [r for r in rows if r[0] == 7]
    assert user7 == [
        (7, "2024-01-01 00:00:00", 1, "view"),
        (7, "2024-01-01 00:00:00", 2, "click"),
        (7, "2024-01-05 00:00:00", 1, "signup"),
    ]


# ---------------------------------------------------------------------------
# transformWithState INITIAL STATE (running_user_totals_warmstart_tws):
# batch-computed state seeds the stream — the lambda-architecture bridge
# ---------------------------------------------------------------------------


def test_warmstart_continues_from_batch_state(spark, tmp_path):
    """User 7's stream totals must INCLUDE the batch-computed history
    (n=2, s=3.0) without the stream ever reading those rows; user 8 has
    no history row and starts cold from zero."""
    from udacity_data_engineering_spark.streaming.event_stream import (
        run_available_now,
    )
    from udacity_data_engineering_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        ensure_tws_runtime,
        running_user_totals_warmstart_tws,
    )

    assert ensure_tws_runtime(spark)
    feed = str(tmp_path / "feed")
    _map_feed(
        feed,
        [
            [("2024-01-01 00:00:00", 7, "x", 10.0)],
            [("2024-01-01 01:00:00", 7, "x", 0.5),
             ("2024-01-01 01:00:00", 8, "x", 2.0)],
        ],
    )
    initial = spark.createDataFrame(
        [(7, 2, 3.0)], "user_id long, n long, s double"
    )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        run_available_now(
            running_user_totals_warmstart_tws(
                stream_events(spark, feed, max_files_per_trigger=1), initial
            ),
            "warm_sink",
            str(tmp_path / "ck"),
            output_mode="update",
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    final = {
        r.user_id: (r.n_events, r.sum_value)
        for r in spark.sql(
            """SELECT user_id, n_events, sum_value FROM (
                   SELECT *, row_number() OVER (
                       PARTITION BY user_id ORDER BY n_events DESC) rn
                   FROM warm_sink) WHERE rn = 1"""
        ).collect()
    }
    spark.catalog.dropTempView("warm_sink")
    assert final[7] == (4, 13.5)  # 2 history + 2 live, 3.0 + 10.5
    assert final[8] == (1, 2.0)  # cold start: no initial row
