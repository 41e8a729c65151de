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
    # Round-12 rotation: 17 spine slots + 33 never-driver-checked
    # rotations from the r11-computed queue. The spine: six §2A parity
    # anchors; the three r11 hash-reds RE-PROVING their HUGEINT oracle
    # casts (q_dq_checks, q_streaming_dq_monitor, q_gap_sessionize —
    # plus q_dq_observed_write below, pre-emptively fixed before its
    # first window); the two new r12 provables (q_sparkify_artists —
    # the last reference table, q_pq_topk_exhaustive — rerank=corpus
    # exact PQ); and six single-slot family anchors for E2/E3/E4/E6/
    # E7/E8/E9 whose queue has no representative (q_parts_supplier_cnt
    # doubles E2+E7, q_range_join_binned doubles E7+E8). Every
    # rotated-out name remains sweep-verified at three scales.
    "q_scan_count",  # 2A.6 parquet scan + 2A.22 count
    "q_dateparts",  # 2A.14/11/13 datetime parts + events nanos shim
    "q_join_multikey",  # 2A.17 3-key composite equi-join
    "q_sql_entry",  # 2A.15/16/18 temp view + SQL + aliasing
    "q_parquet_partitioned",  # 2A.20 hive sink + pruned re-read
    "q_sparkify_songplays_nat",  # the reference's whole program, hash-proven
    "q_dq_checks",  # RE-PROOF: oracle HUGEINT->BIGINT cast (r11 red)
    "q_streaming_dq_monitor",  # RE-PROOF: oracle cast (r10+r11 red)
    "q_gap_sessionize",  # RE-PROOF: oracle cast (r11 red)
    "q_sparkify_artists",  # NEW r12: last reference table hash-proven
    "q_pq_topk_exhaustive",  # NEW r12: rerank=corpus exact PQ vs brute oracle
    "q_parts_supplier_cnt",  # E2+E7 family anchor
    "q_rollup",  # E3 family anchor
    "q_topn",  # E4 + 2A.21 family anchor
    "q_setops",  # E6 family anchor
    "q_range_join_binned",  # E7+E8 family anchor
    "q_json_extract",  # E9 family anchor
    # Four NEW r12 operators built mid-round take four rotation slots —
    # first driver proofs beat second consecutive re-checks; the four
    # deferred sql-surface rotations (q_cte, q_in_subquery,
    # q_scalar_subquery, q_having) are pure Catalyst-translation shapes,
    # sweep-verified at three scales, and join the r13 queue.
    "q_decontaminate_bloom",  # NEW r12: bloom prefilter == exact oracle
    "q_shard_assignment",  # NEW r12: balanced shard round-robin assignment
    "q_shard_manifest",  # NEW r12: per-shard balance totals
    "q_random_projection",  # NEW r12: deterministic JL projection
    # --- 33 never-driver-checked rotations (queue computed end of r11) ---
    "q_streaming_edge_lake",  # r11 addition: streaming edge-lake ingest
    "q_edge_lake_compacted",  # r11 addition: lake compaction invariant
    "q_kmeans_update",  # r11 addition: mini-batch centroid refresh
    "q_dq_observed_write",  # r11 addition: Observation-API DQ (cast fixed)
    "q_correlated_subquery",  # sql-surface tail
    "q_conditional_agg",
    "q_minmax_by",
    "q_array_funcs",
    "q_map_funcs",
    "q_regex_funcs",
    "q_date_arithmetic",
    "q_higher_order_funcs",
    "q_posexplode",
    "q_unpivot",
    "q_count",
    "q_epoch_upsample",  # sampling
    "q_source_caps",
    "q_shuffle_order",
    "q_multimodal_audio",  # E15 multimodal
    "q_multimodal_dedup",
    "q_multimodal_shared_frames",
    "q_textfile_parse",  # sources/layout
    "q_xml_roundtrip",
    "q_sorted_layout",
    "q_embedding_quantize",  # embeddings
    "q_embedding_neardup",
    "q_funnel",  # analytics
    "q_retention_cohorts",
    "q_click_edges",
)
# Round-13 rotation queue (computed at the end of round 12): 19 SQL-
# oracled names remain never-driver-checked — the deferred sql_surface
# trio (q_string_agg, q_stats_agg, q_histogram) and the text/quality
# tail (q_doc_stats, q_doc_quality, q_lang_dist, q_token_count_regex,
# q_token_entropy, q_top_tokens_per_lang, q_text_normalize,
# q_text_scrub, q_rolling_hash, q_repetition_filter, q_length_outliers,
# q_profile, q_group_zscore, q_charlm_lang_filter, q_quality_ensemble,
# q_doc_chunks_bpe), the four sql-surface rotations deferred to make
# room for the round-12 additions (q_cte, q_in_subquery,
# q_scalar_subquery, q_having), and the five round-12 operators built
# after the window was fixed (q_export_pipeline, q_cms_sketch,
# q_cms_estimates, q_streaming_stateful_totals,
# q_edge_lake_time_travel) = 28 names. One rotation clears the debt
# entirely with ~22 spine slots to spare; 11 rows-only names stay
# sweep+pytest-verified by design.


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
