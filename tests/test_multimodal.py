"""E15 multimodal plumbing tests: binaryFile scan, Arrow-batched decode
(deterministic fake kernel), frame sampling, and the explicit real-decode
stub contract."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.multimodal import (
    MEDIA_DIR,
    audio_window_features,
    decode_fake,
    decode_media,
    decode_real,
    frame_sample,
    read_media,
    resize_media,
)


def test_binary_scan_schema(spark):
    df = read_media(spark)
    assert dict(df.dtypes)["content"] == "binary"
    assert df.count() == 7


def test_decode_matches_fixture_headers(spark):
    rows = decode_media(read_media(spark)).collect()
    assert len(rows) == 7
    for r in rows:
        raw = open(r.path.removeprefix("file:"), "rb").read()
        w, h = struct.unpack(">II", raw[:8])
        assert (r.meta.width, r.meta.height) == (w, h)
        assert r.meta.format == "img"
        assert len(r.features) == 8
        assert abs(sum(r.features) - 1.0) < 1e-6  # normalized histogram
        assert r.n_bytes == len(raw)


def test_decode_real_is_marked_stub():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00" * 16)


def test_frame_sample_partitions_payload(spark):
    df = frame_sample(read_media(spark), n_frames=4)
    rows = df.collect()
    assert len(rows) == 28  # 7 files x 4 frames
    per_path = {}
    for r in rows:
        per_path.setdefault(r.path, []).append(r)
    for path, frames in per_path.items():
        raw = open(path.removeprefix("file:"), "rb").read()
        got = b"".join(f.frame for f in sorted(frames, key=lambda f: f.frame_id))
        assert got == raw[8:]  # frames tile the payload exactly — no gaps/tail loss


def test_resize_nearest_neighbour_exact(spark):
    """out[i] == payload[(i*L)//target] for every file — the resample is
    pure index arithmetic, reproducible on any engine."""
    rows = resize_media(read_media(spark), target=16).collect()
    assert len(rows) == 7
    for r in rows:
        raw = open(r.path.removeprefix("file:"), "rb").read()
        payload = raw[8:]
        assert r.orig_len == len(payload)
        want = [payload[(i * len(payload)) // 16] for i in range(16)]
        assert r.resized == want


def test_audio_windows_exact(spark):
    """Per-window RMS / zero-crossings agree with a plain-Python
    recomputation over the same int8 interpretation of the payload."""
    import numpy as np

    rows = audio_window_features(read_media(spark), window=64).collect()
    assert rows
    by_path = {}
    for r in rows:
        by_path.setdefault(r.path, []).append(r)
    for path, rs in by_path.items():
        raw = open(path.removeprefix("file:"), "rb").read()
        wave = np.frombuffer(raw[8:], dtype=np.int8).astype(np.float64)
        n_win = len(wave) // 64
        assert len(rs) == n_win
        for r in sorted(rs, key=lambda r: r.window_id):
            w = wave[r.window_id * 64 : (r.window_id + 1) * 64]
            # raw (unrounded) RMS must be bit-identical: integer squared
            # sums are exact in double and IEEE sqrt is correctly rounded
            assert r.rms == float(np.sqrt((w**2).mean()))
            assert r.zero_crossings == int((np.diff(np.signbit(w)) != 0).sum())


def test_zscore_pandas_vs_builtin(spark, sf_dir):
    """applyInPandas kernel agrees with the pure-SQL window formulation."""
    from udacity_data_engineering_spark.operators.pandas_ops import group_zscore
    from udacity_data_engineering_spark.session import table

    ev = table(spark, sf_dir, "events")
    got = {r.event_id: r.zscore for r in group_zscore(ev).collect()}
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type")
    want = {
        r.event_id: r.z
        for r in ev.select(
            "event_id",
            F.round(
                (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w),
                4,
            ).alias("z"),
        ).collect()
    }
    assert got == want


def test_decode_real_raises_cleanly_without_pil():
    """The integration hook must fail loudly, not silently fake."""
    import pytest

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; covered by test_decode_real_with_pil")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="image library"):
        decode_real(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_decode_real_with_pil(spark):
    """Exercises the REAL kernel end-to-end through decode_media wherever
    PIL exists (skipped in this container — no media libs baked in)."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (12, 7), color=200).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [("mem://a.img", None, len(png), bytearray(png))],
        "path string, modificationTime timestamp, length long, content binary",
    )
    out = decode_media(df, decoder=decode_real).collect()
    assert out[0].meta.width == 12 and out[0].meta.height == 7
    assert abs(sum(out[0].features) - 1.0) < 1e-6
    assert out[0].features[200 >> 5] == 1.0  # constant-gray image


def test_media_dedup_finds_byte_identical_copy(spark):
    """img_006 is a committed byte-copy of img_000: one fingerprint must
    cover both with the lexicographically-first path as survivor."""
    from udacity_data_engineering_spark.operators.multimodal import media_dedup

    rows = media_dedup(read_media(spark)).collect()
    assert len(rows) == 6  # 7 files, one duplicate pair
    dupes = [r for r in rows if r.n_copies > 1]
    assert len(dupes) == 1
    assert dupes[0].n_copies == 2
    assert dupes[0].survivor_path.endswith("img_000.img")


def test_blob_oracles_handle_truncated_files(spark, tmp_path, monkeypatch):
    """The read_blob oracles must agree with the kernels on truncated
    (<8-byte header) files — the corrupt-crawl-artifact input class the
    kernels explicitly guard (decode -> (0,0,zeros), resize -> zeros,
    frames -> empty, audio -> no windows). Repoints MEDIA_DIR at a
    scratch dir holding one truncated and one well-formed file and
    re-runs each hash-proven query against its oracle."""
    import re
    import shutil

    import duckdb

    from udacity_data_engineering_spark.operators import multimodal as mm
    from udacity_data_engineering_spark.plans.registry import all_queries
    from udacity_data_engineering_spark.testing import compare

    scratch = tmp_path / "media_trunc"
    scratch.mkdir()
    shutil.copy(f"{mm.MEDIA_DIR}/img_000.img", scratch / "img_good.img")
    (scratch / "img_trunc.img").write_bytes(b"\x01\x02\x03")  # < 8-byte header
    monkeypatch.setattr(mm, "MEDIA_DIR", str(scratch))

    con = duckdb.connect()
    manifest = all_queries()
    for name in (
        "q_multimodal_decode",
        "q_multimodal_resize",
        "q_multimodal_frames",
        "q_multimodal_audio",
        "q_multimodal_dedup",
    ):
        q = manifest[name]
        sdf = q.fn(spark, str(scratch))
        srows, scols = sdf.collect(), sdf.columns
        # the oracle string baked the fixture MEDIA_DIR at import time —
        # repoint its read_blob glob at the scratch dir
        baked = re.search(r"read_blob\('([^']+)/\*\.img'\)", q.oracle).group(1)
        res = con.execute(q.oracle.replace(baked, str(scratch)))
        problems = compare(
            srows, scols, res.fetchall(), [d[0] for d in res.description]
        )
        assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("n", [1, 3, 5, 7])
def test_frame_sample_tiles_for_any_n(spark, n):
    """Integer DIV boundaries tile exactly for non-power-of-2 n too
    (the advisor's frame_sample finding)."""
    rows = frame_sample(read_media(spark), n_frames=n).collect()
    per_path = {}
    for r in rows:
        per_path.setdefault(r.path, []).append(r)
    assert all(len(v) == n for v in per_path.values())
    for path, frames in per_path.items():
        raw = open(path.removeprefix("file:"), "rb").read()
        payload = raw[8:]
        ordered = sorted(frames, key=lambda f: f.frame_id)
        assert b"".join(f.frame for f in ordered) == payload
        L = len(payload)
        for f in ordered:
            lo, hi = (f.frame_id * L) // n, ((f.frame_id + 1) * L) // n
            assert f.frame == payload[lo:hi]
