"""Degenerate-input robustness sweep: run EVERY declared query against
(a) a zero-row copy of the testdata and (b) a copy with ~10% of every
non-key value nulled, and report crashes.

At 100 TB both are routine — a date filter past the newest partition, a
tenant with no data yet, a lake where upstream extractors emit nulls.
Every operator must return the empty / null-respecting result, never
throw. Round 5 ran both sweeps and fixed the crashes found: empty —
KMeans.fit on zero rows (IVF/semdedup/audit), PQ codebook training on an
empty sample, the schema-less re-read of a file-less partitioned write;
nulls — null embeddings reaching KMeans/GEMM kernels, null text
poisoning the packing kernel, and concat_ws silently DROPPING null
fields in the line serializer (shifting every later field one position).
tests/test_empty_input.py keeps the previously-crashing queries pinned.

Usage: python scripts/empty_probe.py [src_sf_dir] [--nulls]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from udacity_data_engineering_spark.session import TABLES, build_session


def build_empty_dir(src: str, dst: str) -> str:
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        sch = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(sch.empty_table(), f"{dst}/{t}.parquet")
    return dst


def build_nulls_dir(src: str, dst: str, frac: float = 0.10, seed: int = 42) -> str:
    """Copy the testdata with ~frac of every NON-KEY value nulled (keys
    keep joins meaningful); deterministic per seed."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tb = pq.read_table(f"{src}/{t}.parquet")
        cols = {}
        for name in tb.column_names:
            col = tb[name]
            if name.endswith("key") or name in ("doc_id", "vec_id", "event_id"):
                cols[name] = col
                continue
            arr = col.to_pylist()
            for i in np.where(rng.rand(len(tb)) < frac)[0]:
                arr[i] = None
            cols[name] = pa.array(arr, type=col.type)
        pq.write_table(pa.table(cols), f"{dst}/{t}.parquet")
    return dst


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if args else "/root/testdata/sf0.001"
    if "--nulls" in sys.argv:
        mode, dst = "10%-null", build_nulls_dir(src, "/tmp/sf_nulls_probe")
    else:
        mode, dst = "empty", build_empty_dir(src, "/tmp/sf_empty_probe")

    from udacity_data_engineering_spark.plans.registry import all_queries

    spark = build_session(app_name="empty-probe")
    crashed = []
    for name, q in sorted(all_queries().items()):
        try:
            q.fn(spark, dst).collect()
        except Exception as e:  # noqa: BLE001 - a probe reports, not raises
            msg = (str(e).splitlines() or [type(e).__name__])[0][:110]
            crashed.append((name, type(e).__name__, msg))
            print(f"FAIL {name}: {type(e).__name__}: {msg}")
    n = len(all_queries())
    print(f"\n{len(crashed)} of {n} queries crash on {mode} input")
    return 1 if crashed else 0


if __name__ == "__main__":
    sys.exit(main())
