"""sf1 verification tier for the bounded-output operator families
(VERDICT r14 item 8): the committed 3-scale sweep stops at sf0.1; this
probe pushes the Spark-vs-DuckDB value-hash comparison one decade up the
scale axis for the operators whose OUTPUT stays bounded as input grows —
sketches (quantile/CMS/bitmap), file skipping, table fingerprint,
deterministic mode, funnels/paths — i.e. exactly the operators whose
100 TB story is "shuffle bounded by domain/bins/cells, never rows".

The sf1 input is a deterministic 10x replication of sf0.1 with
DISJOINT key spaces per replica (custkey/orderkey/user_id/doc_id each
shifted by replica_idx * 10^8), built with pyarrow so column types are
byte-identical to the source vintage. Replication is the honest probe
shape here: the operators under test are key/domain-bounded, so shifted
replicas grow their domains 10x exactly as a real SF-10x would, while
the oracle stays runnable (DuckDB scans 1.5M-row orders in
milliseconds). The REST of the registry is deliberately excluded: text
near-dup / ANN / streaming queries at sf1 cost minutes each with
oracle-side all-pairs shapes — the documented runtime cap (their scale
evidence is SCALE.md's 100x growth-law probes instead).

A zero-failure run stamps an ``sf1_subset`` stanza into SWEEP.json
(preserved by verify_local's re-stamps while the registry hash matches).

Usage: python scripts/sf1_probe.py [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from udacity_data_engineering_spark.plans.registry import all_queries
from udacity_data_engineering_spark.session import TABLES, build_session
from udacity_data_engineering_spark.testing import compare, oracle_type_problems

#: the bounded-output subset: every query here shuffles domain/bins/
#: cells/files, never rows — the families whose sf1 behavior is worth a
#: direct oracle proof rather than a growth-law probe
SF1_QUERIES = (
    # quantile-sketch family
    "q_quantile_sketch",
    "q_quantile_estimates",
    "q_quantile_sketch_merged",
    "q_quantile_saturation",
    "q_weighted_quantiles",
    # count-min sketch family
    "q_cms_sketch",
    "q_cms_estimates",
    # sketch-warehouse drift monitor
    "q_drift_psi",
    # bitmap exact-distinct family (incl. the sparse/dictionary leg)
    "q_bitmap_distinct_cells",
    "q_bitmap_distinct_rollup",
    "q_bitmap_distinct_sparse",
    # file-skipping family (manifest, bloom, combined)
    "q_file_skipping",
    "q_bloom_file_index",
    "q_file_skipping_combined",
    # integrity / bounded aggregates
    "q_table_fingerprint",
    "q_mode_deterministic",
    # event funnels / paths (per-user bounded output)
    "q_funnel_ordered",
    "q_event_paths",
)

#: per-replica key shift — far above every sf0.1 key domain, so the 10
#: replicas' key spaces are disjoint and domains genuinely grow 10x
SHIFT = 100_000_000

#: natural-key string columns suffixed "|r{i}" per replica (i>0): these
#: are alternate keys whose uniqueness the operators/oracles rely on
UNIQUE_STR_COLS: dict[str, tuple[str, ...]] = {
    "customer": ("c_name",),
}

#: key columns shifted per table (all other columns replicate verbatim)
KEY_COLS: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
    # dims replicate unshifted: nation/region/supplier/part keys are
    # referenced by columns the subset queries never join through
    "nation": (),
    "region": (),
    "supplier": (),
    "part": (),
}


def build_sf1(src: str, dst: str) -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        out = os.path.join(dst, f"{t}.parquet")
        if os.path.exists(out):
            continue  # deterministic build: an existing file is identical
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        keys = KEY_COLS.get(t, ())
        reps = []
        for i in range(10):
            r = tab
            for k in keys:
                idx = r.schema.get_field_index(k)
                shifted = pc.add(r.column(k), pa.scalar(i * SHIFT, r.schema.field(k).type))
                r = r.set_column(idx, r.schema.field(k), shifted)
            # natural-key STRING columns must stay unique per replica
            # too: c_name is customer's alternate key (the surrogate-key
            # dictionary and its oracle both assume one name per
            # custkey), so replicas suffix it. Replica 0 keeps the
            # original bytes.
            for k in UNIQUE_STR_COLS.get(t, ()):
                if i == 0:
                    continue
                idx = r.schema.get_field_index(k)
                suffixed = pc.binary_join_element_wise(
                    pc.cast(r.column(k), pa.string()),
                    pa.array([f"|r{i}"] * len(r), pa.string()),
                    "",
                )
                r = r.set_column(idx, r.schema.field(k), suffixed)
            reps.append(r)
        pq.write_table(pa.concat_tables(reps), out)
    return dst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1_probe_data")
    args = ap.parse_args()

    t0 = time.time()
    sf1 = build_sf1(args.src, args.dst)
    print(f"sf1 data ready at {sf1} ({time.time()-t0:.1f}s)")

    spark = build_session(app_name="sf1-probe")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf1}/{t}.parquet')"
        )

    manifest = all_queries()
    failures = []
    for name in SF1_QUERIES:
        q = manifest[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf1)
            srows = sdf.collect()
            scols = sdf.columns
            rel = con.sql(q.oracle)
            ocols = rel.columns
            problems = oracle_type_problems(ocols, rel.types)
            orows = rel.fetchall()
            problems += compare(srows, scols, orows, ocols)
        except Exception as e:  # noqa: BLE001 - a probe reports, not raises
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            continue
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if not failures:
        _stamp(manifest)
    return 1 if failures else 0


def _stamp(manifest) -> None:
    """Add/refresh the sf1_subset stanza in SWEEP.json. Tied to the same
    registry-names hash as the 3-scale stanzas: any registry change
    invalidates this record too (verify_local drops it on a hash-
    mismatched re-stamp, this script rewrites it)."""
    import datetime
    import hashlib
    import json

    stamp_path = Path(__file__).resolve().parents[1] / "SWEEP.json"
    names = sorted(manifest)
    live_hash = hashlib.sha256("\n".join(names).encode()).hexdigest()
    record = (
        json.loads(stamp_path.read_text()) if stamp_path.exists() else {}
    )
    if record.get("names_sha256") != live_hash:
        print(
            "NOTE: SWEEP.json registry hash is stale — run the full "
            "3-scale sweep first so the sf1 stanza lands on a current "
            "stamp; writing sf1_subset anyway with the live hash"
        )
        record = {
            "registry_count": len(names),
            "names_sha256": live_hash,
            "scales": {},
        }
    record["sf1_subset"] = {
        "date": datetime.date.today().isoformat(),
        "failures": 0,
        "queries": list(SF1_QUERIES),
        "input": "10x disjoint-key replication of sf0.1 (scripts/sf1_probe.py)",
    }
    stamp_path.write_text(json.dumps(record, indent=2) + "\n")
    print(f"stamped SWEEP.json sf1_subset ({len(SF1_QUERIES)} queries)")


if __name__ == "__main__":
    sys.exit(main())
