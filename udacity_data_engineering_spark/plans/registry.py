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
    # Round-9 rotation (continuing r6-r8's): eleven never-driver-checked
    # queries rotate in — the five round-8 operators (BPE counting +
    # the two BPE-unit budget/packing variants, both incremental
    # near-dup paths, per-language charlm, group-granular simhash
    # survivors) and the four round-9 operators (weighted sample,
    # DSIR, substring ranges, hybrid RRF) — and eleven driver-green
    # slots whose family keeps an in-window representative rotate out
    # (r9 out: q_charlm_score, q_length_bucket_batches,
    # q_token_budget_mix — superseded by their by-lang/BPE variants;
    # q_dedup_best_survivors, q_curation_pipeline,
    # q_substring_dupes_winnowed, q_substring_doc_flags, q_knn_join,
    # q_streaming_session, q_stratified_mix, q_cluster_centroids —
    # every family keeps at least one slot, see inline notes).
    # --- §2A reference-parity core (relational / datetime / SQL entry) ---
    "q_scan_count",          # 2A.6 parquet scan + 2A.22 count
    "q_project_rename",      # 2A.7+8 projection (+rename) — the bare
                             # q_project was driver-green r1-r6, rotated
                             # out r7; rename subsumes the projection row
    "q_filter_eq",           # 2A.9
    "q_dedup_key",           # 2A.10 deterministic key-subset dedup
                             # (q_dedup_fullrow: driver-green r4-r5,
                             # rotated out r6; q_dedup_any rows-only
                             # past the window)
    "q_dateparts",           # 2A.14 + 2A.11 derived columns
    "q_synthetic_id_props",  # 2A.12 monotonically_increasing_id — hash-
                             # proven uniqueness properties (round 4
                             # rotation; the raw-ids q_synthetic_id stays
                             # registered rows-only just past the window)
    "q_join_multikey",       # 2A.17 3-key composite equi-join
    "q_sql_entry",           # 2A.15/16/18 temp view + SQL + aliasing
    "q_epoch_to_ts",         # 2A.13 builtin (the parity-UDF variant
                             # q_epoch_to_ts_udf: driver-green r1-r5,
                             # rotated out r6)
    "q_date_format",         # 2A dead-import parity (etl.py date_format)
                             # (q_limit driver-green r1-r6, rotated out
                             # r7 — 2A.21 row fetch stays exercised by
                             # q_topn's sort+limit below)
    # --- §2A sources / sinks ---
    "q_json_schema_scan",    # 2A.4 + 2A.3 (declared-schema scan over the
                             # same multi-file glob; the bare q_scan_glob
                             # was driver-green r1-r6, rotated out r7)
    "q_json_infer_scan",     # 2A.5
    "q_parquet_partitioned", # 2A.20 hive-partitioned sink + pruned
                             # re-read (subsumes 2A.19's plain
                             # write+re-read — q_parquet_roundtrip
                             # driver-green r1-r6, rotated out r7)
    # --- Sparkify 5-table ETL (the reference's whole program) ---
    "q_sparkify_songs",          # (q_sparkify_users / q_sparkify_time:
                                 # driver-green r2-r5, rotated out r6)
    "q_sparkify_songplays_nat",  # hash-proven 3-key join (surrogate-id
                                 # variant q_sparkify_songplays is
                                 # rows-only and sits just past the window)
    # --- SQL scalar surface (rotated in r7; string/math/null rotated
    # out r8 after going driver-green — case_when + pivot keep it) ---
    "q_case_when",             # conditional expressions
    "q_pivot",                 # pivot aggregation
    # --- §2B: one-two per extension family ---
    "q_groupby_agg",           # E1
    "q_count_distinct",        # E2
    "q_cube",                  # E3 (rotated in r6; q_rollup driver-green
                               # r2-r5, rotated out — cube subsumes the
                               # rollup grouping-set shape)
    "q_topn",                  # E4 (+ 2A.21 limit)
    "q_window_running",        # E5 running-frame windows (rotated in r7;
                               # q_window_rank driver-green r1-r6,
                               # rotated out — same family, never-checked
                               # frame shape in)
    "q_setops",                # E6
    "q_join_broadcast_agg",    # E7 (q_join_semi driver-green r1-r5,
                               # rotated out r6)
    "q_salted_join",           # E7/physical skew join (r6; q_salted_agg
                               # driver-green r5-r6, rotated out r7 —
                               # physical family keeps this slot)
    "q_asof_join",             # E8 (q_asof_forward driver-green r6,
                               # rotated out r7 — backward direction
                               # keeps the family)
    "q_json_extract",          # E9
    "q_bm25",                  # E10 ranking (rotated in r6;
                               # q_text_tokens driver-green r1-r6,
                               # rotated out r7 — tokenization stays
                               # exercised inside bm25/vocab/ngrams)
    "q_quality_classifier",    # E10/quality model-based filter (r6)
    "q_charlm_by_lang",        # E10/quality per-language LM scoring
                               # (rotated in r9, never driver-checked;
                               # q_charlm_score driver-green r8, rotated
                               # out — the by-group variant subsumes the
                               # global formula)
    "q_bpe_token_counts",      # E10/llm-pipeline subword counting under
                               # the committed fixture (rotated in r9,
                               # never driver-checked — pins the Arrow
                               # kernel against the reference LUT)
    "q_length_bucket_batches_bpe",  # E10/llm-pipeline padded-batch
                               # packing in BPE units (rotated in r9;
                               # whitespace q_length_bucket_batches
                               # driver-green r8, rotated out)
    "q_token_budget_mix_bpe",  # E10/sampling token-budget mixing in BPE
                               # units (rotated in r9; whitespace
                               # q_token_budget_mix driver-green r8,
                               # rotated out)
    "q_weighted_sample",       # sampling: deterministic weighted
                               # sampling w/o replacement (round 9 op,
                               # priority sampling — hash-proven;
                               # q_stratified_mix driver-green r1-r8,
                               # rotated out — hash-cut sampling stays
                               # exercised through the budget mixes)
    "q_dsir_mix",              # quality/sampling: DSIR importance
                               # resampling (round 9 op, hash-proven;
                               # q_curation_pipeline driver-green r8,
                               # rotated out — percentile-cutoff
                               # composition stays exercised here)
    "q_minhash_dedup_survivors",  # E11/E12 end-to-end dedup pipeline
                               # (q_doc_fingerprint / q_doc_dedup_survivors
                               # driver-green r2-r5, rotated out r6)
    "q_dedup_components",      # E11 connected-components labeling (r6)
    "q_incremental_neardup",   # E11/E12 batch-vs-lake MinHash (rotated
                               # in r9, never driver-checked; rows-only
                               # by design — seed-specific banding;
                               # q_dedup_best_survivors driver-green r8,
                               # rotated out)
    "q_incremental_neardup_simhash",  # E12 batch-vs-lake SimHash
                               # (rotated in r9, never driver-checked;
                               # rows-only — hash-specific banding)
    "q_substring_dupes",       # E11+ substring-level dedup (rotated in
                               # r8; driver-green r8)
    "q_substring_ranges",      # E11+ maximal duplicated-range
                               # coalescing (round 9 op, hash-proven;
                               # q_substring_dupes_winnowed +
                               # q_substring_doc_flags driver-green r8,
                               # rotated out — the family keeps dupes +
                               # ranges)
    "q_embedding_neardup_lsh", # E12 scale path
    "q_simhash_candidates",    # E12/dedup
    "q_simhash_survivors",     # E11/E12 SimHash dedup decision (rotated
                               # in r9, never driver-checked; rows-only
                               # — group-granular graph; q_knn_join
                               # driver-green r8, rotated out)
    "q_hybrid_rrf",            # E10/E12 hybrid BM25+cosine retrieval
                               # via RRF (round 9 op, hash-proven;
                               # q_cluster_centroids driver-green
                               # r2-r8, rotated out — embedding
                               # housekeeping stays exercised in the
                               # dense leg here)
    "q_ivf_topk",              # ANN scale path
    "q_session_window",        # E13 (q_tumbling_agg driver-green r1-r5,
                               # rotated out r6 — the same aggregate is
                               # hash-proven through the STREAM path by
                               # q_streaming_tumbling below; the
                               # overlapping-window variant
                               # q_sliding_window driver-green r7,
                               # rotated out r8)
    "q_multimodal_resize",     # E15 resize plumbing (r6;
                               # q_multimodal_decode driver-green r2-r6,
                               # rotated out r7 — E15 keeps this slot +
                               # decode stays pytest/oracle-covered)
    "q_streaming_dedup_watermark",  # E14 — real availableNow stream run,
                                    # hash-proven via exact-redelivery
                                    # injection (round 5)
    "q_streaming_tumbling",    # E14/E13 stream-batch parity as a
                               # driver-checked fact (rotated in r6;
                               # q_streaming_session driver-green r8,
                               # rotated out r9 — merging-interval state
                               # stays pytest- and probe-covered)
)


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
