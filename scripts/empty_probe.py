"""Empty-input robustness sweep: run EVERY declared query against a
zero-row copy of the testdata (same schemas) and report crashes.

At 100 TB a partition-pruned-to-empty input is routine — a date filter
past the newest partition, a tenant with no data yet, a backfill that
hasn't landed. Every operator must return an empty (or trivially
degenerate) result, never throw. Round 5 ran this and fixed the five
crashes it found (KMeans.fit on zero rows in the IVF/semdedup paths,
codebook training on an empty sample in PQ, and the schema-less re-read
of a file-less partitioned write); tests/test_empty_input.py keeps the
previously-crashing queries pinned.

Usage: python scripts/empty_probe.py [src_sf_dir]
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


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = build_empty_dir(src, "/tmp/sf_empty_probe")

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
    print(f"\n{len(crashed)} of {n} queries crash on empty input")
    return 1 if crashed else 0


if __name__ == "__main__":
    sys.exit(main())
