"""Testdata-vintage pinning — the driver's events.parquet has shipped ts
as parquet TIMESTAMP(NANOS) (read as int64 via the nanosAsLong shim) and
as TIMESTAMP(MICROS). Every ingest path must normalize both to identical
timestamps, and an unknown vintage must fail loudly — so the next silent
testdata change breaks here in pytest, not in the driver's bench.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from udacity_data_engineering_spark.functions.datetime_fns import (
    _events_with_ms,
    events_ms_expr,
)
from udacity_data_engineering_spark.session import table
from udacity_data_engineering_spark.streaming import run_available_now, stream_events

TS = [
    datetime(2024, 1, 1, 2, 22, 33, 123000),
    datetime(2024, 1, 1, 5, 0, 0),
    datetime(2024, 6, 15, 23, 59, 59, 500000),
]


def _write_events(dirpath, ts_unit):
    """One tiny events.parquet with ts at the given pyarrow unit.

    version='2.6' keeps nanos as TIMESTAMP(NANOS) (the old driver vintage,
    which Spark reads as int64 under nanosAsLong); 'us' is the current one.
    """
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS, pa.timestamp(ts_unit)),
            "user_id": pa.array([10, 20, 10], pa.int64()),
            "event_type": pa.array(["click", "view", "click"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"a":1}', "{}", "{}"]),
        }
    )
    dirpath.mkdir(parents=True, exist_ok=True)
    pq.write_table(tbl, str(dirpath / "events.parquet"), version="2.6")
    return str(dirpath)


@pytest.fixture(scope="module")
def vintage_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("vintages")
    return {
        "nanos": _write_events(base / "nanos", "ns"),
        "micros": _write_events(base / "micros", "us"),
    }


def test_fixture_vintages_differ_as_intended(spark, vintage_dirs):
    dt = {
        k: dict(spark.read.parquet(f"{d}/events.parquet").dtypes)["ts"]
        for k, d in vintage_dirs.items()
    }
    assert dt["nanos"] == "bigint"  # nanosAsLong shim active
    assert dt["micros"] in ("timestamp", "timestamp_ntz")


def test_batch_table_normalizes_both_vintages(spark, vintage_dirs):
    rows = {
        k: sorted(
            (r.event_id, r.ts)
            for r in table(spark, d, "events").select("event_id", "ts").collect()
        )
        for k, d in vintage_dirs.items()
    }
    assert rows["nanos"] == rows["micros"]
    assert [ts for _, ts in rows["nanos"]] == TS


def test_events_with_ms_normalizes_both_vintages(spark, vintage_dirs):
    ms = {
        k: sorted((r.event_id, r.ms) for r in _events_with_ms(spark, d).collect())
        for k, d in vintage_dirs.items()
    }
    assert ms["nanos"] == ms["micros"]
    import calendar

    epoch_ms = [
        calendar.timegm(t.timetuple()) * 1000 + t.microsecond // 1000 for t in TS
    ]  # integer arithmetic, host-TZ independent (float *1000 truncates)
    assert sorted(v for _, v in ms["nanos"]) == sorted(epoch_ms)


def test_stream_events_normalizes_both_vintages(spark, vintage_dirs, tmp_path):
    got = {}
    for k, d in vintage_dirs.items():
        stream = stream_events(spark, d).selectExpr(
            "event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts"
        )
        run_available_now(
            stream, f"vintage_{k}", str(tmp_path / f"ckpt_{k}"), output_mode="append"
        )
        got[k] = sorted(tuple(r) for r in spark.table(f"vintage_{k}").collect())
    assert got["nanos"] == got["micros"]
    assert sorted(ts for _, ts in got["nanos"]) == sorted(TS)


def test_stream_on_empty_dir_defines_without_data(spark, tmp_path):
    """File-stream invariant: a stream can be defined over an empty source
    directory (files arrive later); the vintage peek must not break it."""
    src = tmp_path / "empty_events"
    src.mkdir()
    stream = stream_events(spark, str(src))
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_unknown_vintage_fails_loudly(spark, tmp_path):
    bad = spark.range(3).selectExpr(
        "id AS event_id", "CAST(id AS STRING) AS ts"
    )
    with pytest.raises(TypeError, match="unexpected dtype"):
        events_ms_expr(bad)
    src = str(tmp_path / "bad_events")
    bad.write.parquet(src)
    with pytest.raises(TypeError, match="unexpected dtype"):
        stream_events(spark, src)


def test_peek_recurses_partitioned_dirs_and_uri(tmp_path):
    """Vintage peek must find footers nested under hive partitions and
    accept file: URIs; remote URIs fail loudly (advisor findings)."""
    from udacity_data_engineering_spark.streaming.event_stream import (
        _peek_ts_dtype,
    )

    nested = tmp_path / "part" / "dt=2024-01-01"
    _write_events(nested, "ns")
    assert _peek_ts_dtype(str(tmp_path / "part")) == "bigint"
    assert _peek_ts_dtype("file://" + str(tmp_path / "part")) == "bigint"
    assert _peek_ts_dtype("file:" + str(tmp_path / "part")) == "bigint"
    with pytest.raises(ValueError, match="non-local"):
        _peek_ts_dtype("s3a://bucket/events")


def test_peek_treats_tz_aware_nanos_as_bigint(tmp_path):
    """tz-aware TIMESTAMP(NANOS) is still surfaced as int64 by nanosAsLong,
    so the peek must classify it as the bigint vintage."""
    from udacity_data_engineering_spark.streaming.event_stream import (
        _peek_ts_dtype,
    )

    d = tmp_path / "tz_nanos"
    d.mkdir()
    tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array(
                [datetime(2024, 1, 1, tzinfo=timezone.utc)],
                pa.timestamp("ns", tz="UTC"),
            ),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"), version="2.6")
    assert _peek_ts_dtype(str(d)) == "bigint"


def test_hadoop_peek_resolves_both_vintages_over_a_scheme(spark, tmp_path):
    """Round-6: remote-scheme paths self-configure through the JVM
    gateway's Hadoop FileSystem instead of the round-5 fail-loud
    stopgap. Exercised over Hadoop's own file:// scheme (the same
    FileSystem API s3a/hdfs connectors implement), including a hive-
    partitioned layout with commit-protocol noise that must be pruned,
    an empty source, and a missing path."""
    from udacity_data_engineering_spark.session import configure
    from udacity_data_engineering_spark.streaming.event_stream import (
        _peek_ts_dtype,
        _peek_ts_dtype_hadoop,
    )

    configure(spark)  # nanosAsLong shim, as stream_events guarantees
    nested = tmp_path / "part" / "dt=2024-01-01"
    _write_events(nested, "ns")
    # commit-protocol noise a real writer leaves behind
    (tmp_path / "part" / "_temporary").mkdir()
    (tmp_path / "part" / "_SUCCESS").touch()
    uri = "file://" + str(tmp_path / "part")
    assert _peek_ts_dtype_hadoop(spark, uri) == "bigint"

    micros = tmp_path / "micros"
    _write_events(micros, "us")
    assert _peek_ts_dtype_hadoop(spark, "file://" + str(micros)) == "timestamp_ntz"

    empty = tmp_path / "empty"
    empty.mkdir()
    assert _peek_ts_dtype_hadoop(spark, "file://" + str(empty)) == "timestamp_ntz"

    with pytest.raises(FileNotFoundError):
        _peek_ts_dtype_hadoop(spark, "file://" + str(tmp_path / "nope"))

    # routing: a scheme'd path WITH a session takes the Hadoop branch...
    assert _peek_ts_dtype(uri, spark=spark) == "bigint"
    # ...and still fails loudly without one (config error, not a default)
    with pytest.raises(ValueError, match="non-local"):
        _peek_ts_dtype("s3a://bucket/events")


def test_stream_events_reads_hadoop_scheme_source(spark, tmp_path):
    """End-to-end: stream_events over a file:// URI source — the peek,
    the declared schema, and the stream itself all route through the
    Hadoop filesystem as they would on s3a/hdfs."""
    src = tmp_path / "scheme_src"
    _write_events(src, "ns")
    stream = stream_events(spark, "file://" + str(src))
    assert stream.isStreaming
    run_available_now(
        stream, "hadoop_scheme_sink", str(tmp_path / "ckpt"), output_mode="append"
    )
    got = spark.table("hadoop_scheme_sink")
    assert got.count() == 3
    assert [f.name for f in got.schema.fields][:2] == ["event_id", "ts"]
