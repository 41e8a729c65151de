"""Local mirror of the driver's t2 correctness gate.

Runs every declared query through Spark AND its DuckDB oracle at the given
scale factor, then compares row count, sorted column names, and an
order-insensitive multiset of normalized rows. Exits non-zero on any
mismatch. Use -q to restrict to a comma-separated subset.

Usage: python scripts/verify_local.py [--sf /root/testdata/sf0.001] [-q name1,name2]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from datetime import date, datetime
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from udacity_data_engineering_spark.plans.registry import all_queries
from udacity_data_engineering_spark.session import TABLES, build_session


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and represent with enough digits to be exact
        return repr(v + 0.0)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return repr(v)


def row_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("-q", "--queries", default="")
    ap.add_argument("--skip-rows-only", action="store_true")
    args = ap.parse_args()

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
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sm = row_multiset([tuple(r) for r in srows], scols)
            om = row_multiset(orows, ocols)
            if sm != om:
                extra_s = [k for k in sm if sm[k] != om.get(k, 0)][:3]
                extra_o = [k for k in om if om[k] != sm.get(k, 0)][:3]
                problems.append(f"values spark-only={extra_s} oracle-only={extra_o}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
