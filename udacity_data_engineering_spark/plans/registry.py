"""Declared-query registry — the driver-facing manifest.

Every operator from SURVEY.md §2 that we claim as implemented registers
itself here as a named query: a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) the equivalent DuckDB oracle SQL.
``__spark_entry__.py`` exposes this registry verbatim to the driver, which
hash-compares both sides at sf0.01 (row count + schema + order-insensitive
value hash).

Matching rules baked in from SURVEY.md §5: identical output column aliases
on both sides; float aggregates rounded on both sides; Spark ``dayofweek``
= DuckDB ``dayofweek + 1``; deterministic total order for every dedup/limit
query; oracle integer results cast to the width Spark produces.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a declared query to the manifest."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


# Driver-facing manifest order. The driver's correctness window checks the
# FIRST 50 entries in insertion order, so the front of this list must cover
# every SURVEY §2A parity operator plus at least one query per §2B extension
# family; everything not listed keeps its module-import registration order
# after these. A name listed here but not registered is a hard error (catches
# renames going stale).
DRIVER_PRIORITY: tuple[str, ...] = (
    # Round-15 rotation (executes the queue recorded in the r14 ledger):
    # six §2A parity anchors; the THREE new r15 provables; the three
    # queries whose behavior changed this round (ADVICE fixes / feed
    # refactor) so their new hashes land the same round; the three
    # round-trips whose oracles have NEVER been driver-hash-verified
    # (oracles postdate their r1 rows-only records — VERDICT r14 item 1);
    # the 14 remaining r1-stale TPC-H shapes + the 8-name r5 batch
    # (closing the entire "newest driver record predates its oracle"
    # class); the ELEVEN rows-only queries that have never appeared in
    # any driver window (VERDICT r14 item 7 — a rows-only record each);
    # and two family anchors.
    "q_scan_count",  # 2A.6 parquet scan + 2A.22 count
    "q_dateparts",  # 2A.14/11/13 datetime parts + events nanos shim
    "q_join_multikey",  # 2A.17 3-key composite equi-join
    "q_sql_entry",  # 2A.15/16/18 temp view + SQL + aliasing
    "q_parquet_partitioned",  # 2A.20 hive sink + pruned re-read
    "q_sparkify_songplays_nat",  # the reference's whole program, hash-proven
    # --- new r15 operators: first driver proofs ---
    "q_bitmap_distinct_sparse",  # dictionary-encoded exact distinct
    "q_streaming_stateful_mapstate",  # TWS per-key collection state
    "q_file_skipping_combined",  # unified manifest+bloom pruning
    "q_streaming_stateful_liststate",  # TWS bounded ordered buffer
    "q_streaming_stateful_warmstart",  # TWS initial-state warm start
    "q_bloom_join",  # bloom-prefiltered equi-join
    "q_drift_psi",  # sketch-warehouse drift monitor
    "q_setops_all",  # bag-semantics INTERSECT/EXCEPT ALL
    "q_streaming_outer_join",  # watermarked stream-stream LEFT OUTER
    "q_recursive_cte",  # WITH RECURSIVE frontier iteration
    # --- changed in r15 (ADVICE fixes): re-prove ---
    "q_event_paths",  # NULL-ordering contract made explicit
    "q_surrogate_keys",  # pinned range partitioning + FS bootstrap
    # --- oracles never driver-hash-verified (r1 rows-only records) ---
    "q_csv_roundtrip",
    "q_orc_roundtrip",
    "q_compact_small_files",
    # --- stalest re-proofs: last driver-checked round 1 ---
    "q_important_parts",  # TPC-H Q11 shape
    "q_join_anti",  # E7 anti join
    "q_join_outer",  # E7 outer join
    "q_market_share",  # Q8 shape
    "q_min_cost_supplier",  # Q2 shape
    "q_ngram_jaccard",  # exact near-dup ground truth
    "q_order_priority",  # Q4 shape
    "q_priority_shipclass",  # Q12 shape
    "q_product_profit",  # Q9 shape
    "q_promo_revenue",  # Q14 shape
    "q_returned_items",  # Q10 shape
    "q_small_qty_revenue",  # Q17 shape
    "q_top_supplier",  # Q15 shape
    "q_waiting_suppliers",  # Q21 shape
    # --- the r5 batch: last driver-checked round 5 ---
    "q_dedup_fullrow",
    "q_doc_dedup_survivors",
    "q_doc_fingerprint",
    "q_epoch_to_ts_udf",
    "q_gopher_rules",
    "q_join_semi",
    "q_sparkify_time",
    "q_sparkify_users",
    # --- rows-only, never in any driver window: one record each (four
    # of the original eleven — q_sample, q_sparkify_songplays,
    # q_sequence_packing, q_sketch_rollup — are deferred to the r16
    # window per VERDICT r14 item 7's "across r15/r16" allowance; their
    # slots went to the seven late-r15 operators so no registration
    # leaves this round unscheduled) ---
    "q_bpe_tokenize",
    "q_neardup_ensemble",
    "q_ensemble_survivors",
    "q_ivfpq_topk",
    "q_pq_topk",
    "q_semantic_dedup",
    "q_neardup_drop_accounting",
)
# Rotation ledger after this window: never-driver-checked SQL-oracled
# names = 0 AND no SQL-oracled query's newest driver record predates its
# oracle (the csv/orc/compact trio was the last of that class) AND
# never-windowed rows-only names down from 11 to 4. Queue for r16:
# (a) the four deferred rows-only names q_sample, q_sparkify_songplays,
# q_sequence_packing, q_sketch_rollup;
# (b) q_streaming_stateful_ttl (its feed writer was factored out in r15
# — sweep-verified, deserves a fresh driver hash); (c) the r6 batch
# (q_scan_glob, q_project, q_project_rename, q_filter_eq, q_limit,
# q_parquet_roundtrip, q_text_tokens, q_salted_agg, q_tumbling_agg and
# peers); (d) the family anchors rotated out in r15
# (q_parts_supplier_cnt, q_rollup, q_topn, q_setops, q_json_extract,
# q_window_rank, q_stratified_fixed_k, q_session_window, q_doc_dedup,
# q_cluster_centroids, q_multimodal_decode,
# q_streaming_stateful_totals_tws — all driver-proven r14).


def all_queries() -> dict[str, Query]:
    """Import every operator module (triggering registration) and return
    the full manifest, reordered so ``DRIVER_PRIORITY`` comes first."""
    import udacity_data_engineering_spark.etl.sparkify_queries  # noqa: F401
    import udacity_data_engineering_spark.functions  # noqa: F401
    import udacity_data_engineering_spark.operators  # noqa: F401
    import udacity_data_engineering_spark.sources  # noqa: F401
    import udacity_data_engineering_spark.streaming.stream_queries  # noqa: F401

    missing = [n for n in DRIVER_PRIORITY if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_PRIORITY names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in DRIVER_PRIORITY}
    ordered.update({n: q for n, q in _REGISTRY.items() if n not in ordered})
    return ordered
