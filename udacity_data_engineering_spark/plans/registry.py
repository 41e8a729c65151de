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
    # Round-11 rotation — the debt-clearing round: 38 never-driver-
    # checked SQL-oracled queries rotate in at once (r10 verdict: 86
    # provable names were waiting outside the window while green slots
    # re-proved themselves; at 17/round that was ~6 rounds of debt).
    # Both err=no_oracle residents (q_ivf_topk, q_embedding_neardup_lsh)
    # rotate out for the ANN family's PROVABLE representative
    # (q_ivf_topk_exhaustive: nprobe=k makes IVF exact). The spine that
    # stays: six SS2A parity anchors, the E2/E4 anchors with no
    # never-checked oracled siblings, and q_streaming_dq_monitor, which
    # MUST re-prove its round-11 idempotent-log fix. Every rotated-out
    # name remains sweep-verified at three scales (SWEEP.json).
    "q_scan_count",  # 2A.6 parquet scan + 2A.22 count
    "q_dateparts",  # 2A.14/11/13 datetime parts + events nanos shim
    "q_join_multikey",  # 2A.17 3-key composite equi-join
    "q_sql_entry",  # 2A.15/16/18 temp view + SQL + aliasing
    "q_parquet_partitioned",  # 2A.20 hive sink + pruned re-read
    "q_sparkify_songplays_nat",  # the reference's whole program, hash-proven
    "q_count_distinct",  # E2 (no never-checked oracled sibling)
    "q_topn",  # E4 + 2A.21 (no never-checked oracled sibling)
    "q_streaming_dq_monitor",  # r10's one red: idempotent log RE-PROOF
    "q_ivf_topk_exhaustive",  # NEW r11: nprobe=k exact IVF vs brute oracle
    "q_lake_lifecycle",  # NEW r11: composed upsert+delete+TTL+diff
    "q_pagerank_persisted",  # NEW r11: pagerank off the click-edge lake
    "q_substring_scrub",  # E11+ scrub
    "q_range_join_binned",  # E8+ grid-binned band join
    "q_merge_delete",  # lake GDPR delete
    "q_retention_expire",  # lake partition TTL
    "q_dq_checks",  # declarative DQ gate
    "q_skew_report",  # E1/E7 skew diagnosis
    "q_streaming_lake_upsert",  # E14 idempotent MERGE sink
    "q_streaming_stream_join",  # E14 stream-stream interval join
    "q_streaming_static_join",  # E14 stream-static join
    "q_resample_ffill",  # E8/E13 grid resample + ffill
    "q_resample_interp",  # E8/E13 linear interpolation
    "q_robust_outliers",  # median/MAD robust z
    "q_negative_samples",  # deterministic negative sampling
    "q_kmeans_assign_new",  # incremental k-means assignment
    "q_chisq_lang_source",  # chi-square independence cells
    "q_seasonal_anomaly",  # seasonal residual anomaly
    "q_variant_extract",  # E9 VARIANT path extraction
    "q_lateral_join",  # LATERAL correlated join
    "q_json_construct",  # E9 JSON construction
    "q_try_funcs",  # try_* error-safe scalar surface
    "q_multimodal_frames",  # E15 frame sampling
    "q_multimodal_frame_dedup",  # E15 frame-level dedup
    "q_udtf_ngrams",  # Python UDTF surface
    "q_pandas_udaf_median",  # Arrow UDAF surface
    "q_window_navigation",  # E5 lead/lag/first/last
    "q_window_range_frame",  # E5 RANGE frames
    "q_percentiles",  # exact percentile aggregates
    "q_gap_sessionize",  # E13 gaps-and-islands sessionization
    "q_tfidf",  # E10 tf-idf
    "q_lang_id",  # E10 n-gram language id
    "q_train_val_split",  # leakage-free hash split
    "q_decontaminate",  # eval-contamination scrub
    "q_stratified_fixed_k",  # per-stratum fixed-k sample
    "q_schema_evolution",  # lake schema evolution
    "q_python_datasource",  # Python DataSource API
    "q_grouping_sets",  # E3 GROUPING SETS
    "q_union_missing_cols",  # E6 union by name
    "q_zorder_layout",  # physical: z-order layout
)
# Round-12 rotation queue (computed at the end of round 11, assuming the
# r11 window lands green): 52 SQL-oracled names remain never-driver-
# checked — q_streaming_edge_lake, q_edge_lake_compacted, q_kmeans_update,
# q_dq_observed_write (the r11 additions that missed the frozen window),
# the sql_surface tail (q_cte, q_in_subquery, q_scalar_subquery,
# q_correlated_subquery, q_having, q_conditional_agg, q_minmax_by,
# q_array_funcs, q_map_funcs, q_regex_funcs, q_date_arithmetic,
# q_higher_order_funcs, q_posexplode, q_unpivot, q_string_agg,
# q_stats_agg, q_histogram, q_count), the text/quality tail (q_doc_stats,
# q_doc_quality, q_lang_dist, q_token_count_regex, q_token_entropy,
# q_top_tokens_per_lang, q_text_normalize, q_text_scrub, q_rolling_hash,
# q_repetition_filter, q_length_outliers, q_profile, q_group_zscore,
# q_charlm_lang_filter, q_quality_ensemble, q_doc_chunks_bpe), sampling
# (q_epoch_upsample, q_source_caps, q_shuffle_order), multimodal
# (q_multimodal_audio, q_multimodal_dedup, q_multimodal_shared_frames),
# sources/layout (q_textfile_parse, q_xml_roundtrip, q_sorted_layout),
# embeddings (q_embedding_quantize, q_embedding_neardup), analytics
# (q_funnel, q_retention_cohorts, q_click_edges). At ~40/round the debt
# clears in round 12 with ~12 spine slots to spare; 11 rows-only names
# stay sweep+pytest-verified by design.


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
