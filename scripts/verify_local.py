"""Local mirror of the driver's t2 correctness gate.

Runs every declared query through Spark AND its DuckDB oracle at the given
scale factor, then compares row count, sorted column names, and an
order-insensitive multiset of normalized rows. Exits non-zero on any
mismatch. Use -q to restrict to a comma-separated subset.

A FULL zero-failure run (no -q filter, no --skip-rows-only) stamps
SWEEP.json at the repo root with the registry size, a hash of the sorted
query names, and the verified scale. tests/test_sweep_stamp.py compares
that stamp against the live registry — the same drift guard
INVENTORY.md has — so a "all N queries verified at 3 scales" claim goes
stale loudly (pytest) instead of silently (SCALE.md prose), the failure
mode rounds 4 and 5 each hit once.

Usage: python scripts/verify_local.py [--sf /root/testdata/sf0.001] [-q name1,name2]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from udacity_data_engineering_spark.plans.registry import all_queries
from udacity_data_engineering_spark.session import TABLES, build_session
from udacity_data_engineering_spark.testing import compare, oracle_type_problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("-q", "--queries", default="")
    ap.add_argument("--skip-rows-only", action="store_true")
    ap.add_argument(
        "--stock",
        action="store_true",
        help="driver simulation: a STOCK SparkSession (local[5], default "
        "200 shuffle partitions, none of this repo's confs) — the engine "
        "must self-configure at runtime, exactly as under the external "
        "driver; run from a cwd outside the repo for the full simulation",
    )
    args = ap.parse_args()

    if args.stock:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[5]").getOrCreate()
    else:
        spark = build_session(app_name="verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    manifest = all_queries()
    wanted = [s for s in args.queries.split(",") if s]
    failures = []
    for name, q in sorted(manifest.items()):
        if wanted and name not in wanted:
            continue
        if q.oracle is None and args.skip_rows_only:
            # skip BEFORE executing: the point of the flag is a faster
            # oracle-only sweep (it also suppresses the SWEEP.json stamp,
            # since a partial run proves nothing about full coverage)
            print(f"skip {name}: rows-only")
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, args.sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only, {len(srows)} rows ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                failures.append(name)
                print(f"FAIL {name}: rows-only query returned 0 rows")
            continue
        try:
            rel = con.sql(q.oracle)
            ocols = rel.columns
            # Type gate BEFORE values: DuckDB fetchall() flattens HUGEINT
            # to int, so a repr compare passes queries the driver's typed
            # hash fails (r10/r11 failure class). Reject at the schema.
            problems = oracle_type_problems(ocols, rel.types)
            orows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        problems += compare(srows, scols, orows, ocols)
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if not failures and not wanted and not args.skip_rows_only:
        _stamp_sweep(manifest, args.sf)
    return 1 if failures else 0


def _stamp_sweep(manifest, sf: str) -> None:
    """Record a completed full zero-failure sweep in SWEEP.json (merging
    with other scales' records; a registry change invalidates them all
    since the names hash no longer matches the live registry)."""
    import datetime
    import hashlib
    import json

    stamp_path = Path(__file__).resolve().parents[1] / "SWEEP.json"
    names = sorted(manifest)
    record = {
        "registry_count": len(names),
        "names_sha256": hashlib.sha256("\n".join(names).encode()).hexdigest(),
    }
    existing = {}
    if stamp_path.exists():
        try:
            existing = json.loads(stamp_path.read_text())
        except (json.JSONDecodeError, OSError):
            # a corrupt/half-written stamp must not turn a green sweep
            # into a nonzero exit — start the record over instead
            existing = {}
    same_registry = (
        existing.get("registry_count") == record["registry_count"]
        and existing.get("names_sha256") == record["names_sha256"]
    )
    scales = existing.get("scales", {}) if same_registry else {}
    scale_key = Path(sf).name  # e.g. sf0.01
    scales[scale_key] = {
        "date": datetime.date.today().isoformat(),
        "failures": 0,
    }
    record["scales"] = dict(sorted(scales.items()))
    # the sf1_subset stanza (scripts/sf1_probe.py) is keyed to the same
    # names hash: carry it across same-registry re-stamps, drop it (to
    # be re-proven) when the registry changed
    if same_registry and "sf1_subset" in existing:
        record["sf1_subset"] = existing["sf1_subset"]
    stamp_path.write_text(json.dumps(record, indent=2) + "\n")
    print(f"stamped SWEEP.json: {len(names)} queries @ {scale_key}")


if __name__ == "__main__":
    sys.exit(main())
