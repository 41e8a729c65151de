"""Benchmark harness — mirrors BASELINE.md's query set at the same scale.

Runs the ten headline operator benchmarks (definitions identical to the
measured stock-PySpark baseline in BASELINE.md, which are themselves
analogs of the reference's operators, etl.py citations in SURVEY.md §2A)
plus engine-extension headliners, at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "stock_queries": {...}, "stock_total": ..., "vs_stock": ..., "sf": ...}

The stock_* fields are a same-host, same-run STOCK-PySpark measurement
of the identical ten queries (separate JVM, scripts/measure_baseline.py)
— the self-normalizing A/B that makes cross-round deltas host-drift-free
(round 7; SPARK_GRAFT_NO_AB=1 skips it).

Per-query time is best-of-3 wall clock of the triggering action, after a
session warm-up — the same method BASELINE.md used.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from udacity_data_engineering_spark.functions.datetime_fns import (
    epoch_ms_to_ts_udf,
    events_ms_expr,
)
from udacity_data_engineering_spark.session import build_session, table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
REPS = 3
#: the ten headline queries are 0.1-1 s each on a 32-core box, where
#: scheduler jitter is a large fraction of the measurement: three
#: back-to-back full runs (round 12) put the engine/stock RATIO anywhere
#: in 0.58-0.82 at best-of-3. Best-of-5 on the headline legs costs ~15 s
#: total and visibly tightens the ratio; the long extensions stay at
#: best-of-3 (they are 1-10 s each, where jitter is proportionally small).
HEADLINE_REPS = 5
#: engine/stock ratio on a quiet host lands in 0.58-0.82 at best-of-5
#: (SCALE.md, rounds 7-13). A ratio outside the widened trigger band below
#: is a LOAD signature, not a plan signature — round 13's driver artifact
#: read 2.62x with a uniform ~2-3x slowdown on every query *including a
#: bare count(*) whose plan is byte-identical to stock's*, while three
#: same-box runs read 0.57-0.70x. The A/B design (stock JVM first, engine
#: JVM after, minutes apart) leaves a window where one-sided host load
#: skews the ratio; when the ratio exits this band the harness re-runs
#: BOTH legs once and reports per-query minima across attempts —
#: contention only ever ADDS wall-clock, so min de-contends both sides
#: symmetrically. Both attempts + 1-min load averages are recorded in
#: BENCH_DETAIL.json so a reviewer can adjudicate from the artifact alone.
VS_STOCK_RETRY_BAND = (0.40, 0.95)


def needs_retry(vs_stock: float | None) -> bool:
    """True when the engine/stock ratio is outside the plausible band and
    the run should be repeated before the artifact is trusted."""
    if vs_stock is None:
        return False
    lo, hi = VS_STOCK_RETRY_BAND
    return not (lo <= vs_stock <= hi)


def merge_best(*attempts: dict) -> dict:
    """Per-query minimum across bench attempts (same key set not required:
    a failed retry contributes nothing). Contention inflates wall-clock
    monotonically, so the min over attempts is the de-contended estimate —
    the same reasoning as best-of-N within one attempt, applied across
    attempts."""
    merged: dict = {}
    for att in attempts:
        for name, sec in (att or {}).items():
            if name not in merged or sec < merged[name]:
                merged[name] = sec
    return merged


def measure_stock() -> dict | None:
    """Same-host, same-run STOCK-PySpark baseline: the exact ten headline
    queries via scripts/measure_baseline.py in a subprocess (its own JVM,
    none of this repo's code paths). Host speed drifted ~30% between
    rounds twice (SCALE.md round-6 A/B), making cross-round bench deltas
    unreadable without a same-host reference — so every BENCH_rN.json now
    carries the stock column alongside the engine's, and the engine/stock
    ratio is drift-free by construction. Runs BEFORE the engine session
    so the two JVMs never contend. Returns None on any failure (the
    engine bench must never die because the reference leg did); set
    SPARK_GRAFT_NO_AB=1 to skip."""
    import subprocess

    if os.environ.get("SPARK_GRAFT_NO_AB"):
        return None
    script = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts",
        "measure_baseline.py",
    )
    try:
        out = subprocess.run(
            [sys.executable, script, "--cpus", str(CPUS), "--sf", SF_DIR],
            capture_output=True, text=True, timeout=1200, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)
    except Exception:
        return None


def slim_output(out: dict) -> dict:
    """The stdout line, guaranteed to fit the driver's capture window:
    everything except the per-extension map (full detail is written to
    BENCH_DETAIL.json), with the extension total kept inline so
    extension regressions still move a driver-visible number."""
    slim = {
        k: v for k, v in out.items()
        if k not in ("extensions", "extensions_median", "bench_attempts")
    }
    ext = out.get("extensions", {})
    slim["extensions_total"] = round(sum(ext.values()), 3)
    slim["n_extensions"] = len(ext)
    slim["extensions_file"] = "BENCH_DETAIL.json"
    return slim


def main() -> None:
    stock = measure_stock()
    spark = build_session(app_name="bench", cpus=CPUS, shuffle_partitions=max(CPUS, 16))
    # keep stdout/stderr clean for the driver's tail capture: the JSON
    # line must never share the window with WARN chatter
    spark.sparkContext.setLogLevel("ERROR")
    t = {name: table(spark, SF_DIR, name) for name in
         ("lineitem", "orders", "customer", "events")}
    for name, df in t.items():
        df.createOrReplaceTempView(name)
    raw_events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # dual-vintage: ts is int64 nanos (nanosAsLong shim) or timestamp[us]
    raw_events_ms = events_ms_expr(raw_events)
    tmp = tempfile.mkdtemp(prefix="bench_out_")

    def scan_count_lineitem():
        t["lineitem"].count()

    def filter_project():
        (t["lineitem"].filter(F.col("l_shipdate") < "1996-01-01")
         .select("l_orderkey", "l_extendedprice").count())

    def dedup_dropduplicates():
        t["orders"].dropDuplicates(["o_custkey"]).count()

    def hashagg_groupby():
        (t["lineitem"].groupBy("l_returnflag", "l_linestatus")
         .agg(F.sum("l_quantity"), F.sum("l_extendedprice"),
              F.avg("l_discount"), F.count(F.lit(1))).collect())

    def equijoin_agg():
        (t["orders"].join(t["customer"],
                          t["orders"].o_custkey == t["customer"].c_custkey)
         .groupBy("c_mktsegment").agg(F.sum("o_totalprice")).collect())

    def multicond_join_count():
        spark.sql("""
            SELECT monotonically_increasing_id() AS id,
                   year(o.o_orderdate) AS y, month(o.o_orderdate) AS m,
                   o.o_orderkey, c.c_custkey
            FROM orders o JOIN customer c
              ON o.o_custkey = c.c_custkey AND o.o_totalprice > c.c_acctbal
        """).count()

    def timetable_dateparts_dedup():
        (t["events"].select(
            "ts", F.hour("ts"), F.dayofmonth("ts"), F.weekofyear("ts"),
            F.month("ts"), F.year("ts"), F.dayofweek("ts"))
         .dropDuplicates(["ts"]).count())

    def python_udf_epochms_to_ts():
        # same triggering action as BASELINE.md's recipe (count of the
        # UDF projection); the oracle-checked q_epoch_to_ts_udf covers
        # value correctness of the UDF itself
        raw_events.select(epoch_ms_to_ts_udf(raw_events_ms).alias("st")).count()

    def parquet_write_partitioned():
        # same logical op as BASELINE's recipe; physical strategy is the
        # engine's write_partitioned (cluster-by-partition-cols first:
        # 2x faster, one file per partition instead of tasks x partitions)
        from udacity_data_engineering_spark.sources.parquet_source import (
            write_partitioned,
        )

        write_partitioned(
            t["orders"].withColumns(
                {"year": F.year("o_orderdate"), "month": F.month("o_orderdate")}
            ),
            f"{tmp}/orders_part",
            ["year", "month"],
        )

    def etl_join_write_end2end():
        from udacity_data_engineering_spark.sources.parquet_source import (
            write_partitioned,
        )

        write_partitioned(
            spark.sql("""
                SELECT monotonically_increasing_id() AS songplay_id,
                       o.o_orderkey, year(o.o_orderdate) AS year,
                       month(o.o_orderdate) AS month, c.c_custkey AS user_id,
                       c.c_mktsegment AS level, o.o_totalprice AS amount
                FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            """),
            f"{tmp}/songplays",
            ["year", "month"],
        )

    benches = {
        "scan_count_lineitem": scan_count_lineitem,
        "filter_project": filter_project,
        "dedup_dropDuplicates": dedup_dropduplicates,
        "hashagg_groupby": hashagg_groupby,
        "equijoin_agg": equijoin_agg,
        "multicond_join_count": multicond_join_count,
        "timetable_dateparts_dedup": timetable_dateparts_dedup,
        "python_udf_epochms_to_ts": python_udf_epochms_to_ts,
        "parquet_write_partitioned": parquet_write_partitioned,
        "etl_join_write_end2end": etl_join_write_end2end,
    }

    # session warm-up (JIT, codegen caches, file listing)
    t["lineitem"].count()
    t["events"].count()

    def run_headlines() -> dict:
        out = {}
        for name, fn in benches.items():
            best = float("inf")
            for _ in range(HEADLINE_REPS):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
        return out

    def loadavg1() -> float | None:
        try:
            return round(os.getloadavg()[0], 2)
        except OSError:
            return None

    results = run_headlines()
    attempts = [{
        "queries": results,
        "stock_queries": (stock or {}).get("queries"),
        "loadavg_after_engine_leg": loadavg1(),
    }]
    contention_retry = False
    if stock is not None:
        ratio = sum(results.values()) / stock["total"] if stock["total"] else None
        if needs_retry(ratio):
            # one-leg contention suspected (VERDICT r13): re-run BOTH legs
            # once — stock subprocess first (same never-concurrent design),
            # then the engine headlines in this warm session — and take
            # per-query minima across attempts on each side independently.
            contention_retry = True
            stock2 = measure_stock()
            results2 = run_headlines()
            attempts.append({
                "queries": results2,
                "stock_queries": (stock2 or {}).get("queries"),
                "loadavg_after_engine_leg": loadavg1(),
                "first_attempt_vs_stock": round(ratio, 3),
            })
            results = merge_best(results, results2)
            merged_stock = merge_best(stock["queries"],
                                      (stock2 or {}).get("queries"))
            stock = {"queries": merged_stock,
                     "total": round(sum(merged_stock.values()), 3)}

    # engine-extension headliners (no BASELINE counterpart — reported
    # separately so the headline metric stays comparable to BASELINE.md)
    from udacity_data_engineering_spark.plans.registry import all_queries

    manifest = all_queries()
    extensions = {}
    extensions_median = {}
    for name in (
        "q_window_rank", "q_asof_join", "q_tumbling_agg", "q_session_window",
        "q_cosine_topk", "q_minhash_candidates", "q_text_tokens",
        "q_doc_dedup", "q_group_zscore", "q_shipping_priority",
        "q_local_supplier_volume", "q_embedding_neardup_lsh",
        "q_ivf_topk", "q_large_orders", "q_correlated_subquery",
        "q_gopher_rules", "q_repetition_filter", "q_text_scrub",
        "q_minhash_dedup_survivors", "q_sorted_layout", "q_zorder_layout",
        "q_salted_agg", "q_simhash_candidates", "q_stratified_mix",
        "q_pq_topk", "q_semantic_dedup", "q_incremental_dedup",
        "q_decontaminate", "q_bm25", "q_sliding_window",
        "q_vocab_topk", "q_ngram_counts", "q_text_normalize",
        "q_train_val_split", "q_cluster_centroids", "q_embedding_quantize",
        "q_corpus_pipeline",
        "q_temperature_mix",
        "q_substring_dupes",
        "q_charlm_score",
        "q_curation_pipeline",
        "q_knn_join",
        "q_epoch_upsample",
        "q_quality_classifier",
        "q_streaming_dedup_watermark",
        "q_neardup_ensemble",
        "q_ensemble_survivors",
        # round-7 stragglers (VERDICT r7 item 5) + round-8 additions
        "q_token_budget_mix",
        "q_length_bucket_batches",
        "q_dedup_best_survivors",
        "q_streaming_session",
        "q_simhash_survivors",
        "q_multimodal_frame_dedup",
        "q_multimodal_shared_frames",
        "q_substring_dupes_winnowed",
        "q_bpe_token_counts",
        "q_token_budget_mix_bpe",
        "q_incremental_neardup",
        "q_incremental_neardup_simhash",
        "q_charlm_by_lang",
        "q_weighted_sample",
        "q_stratified_fixed_k",
        "q_hybrid_rrf",
        "q_substring_ranges",
        "q_dsir_mix",
        "q_range_join_binned",
        "q_multimodal_dhash_pairs",
        "q_substring_scrub",
        "q_doc_chunks_bpe",
        "q_source_caps",
        "q_streaming_static_join",
        "q_charlm_lang_filter",
        "q_streaming_stream_join",
        "q_scd2_apply",
        "q_merge_upsert",
        "q_merge_delete",
        "q_heavy_hitters",
        "q_dq_checks",
        "q_streaming_lake_upsert",
        "q_lake_diff",
        "q_incremental_substring",
        "q_streaming_dq_monitor",
        "q_retention_expire",
        "q_sketch_rollup",
        "q_skew_report",
        "q_fuzzy_match",
        # round-9c graph/ML + round-10 additions
        "q_click_edges",
        "q_markov_transitions",
        "q_pagerank",
        "q_kmeans_train",
        "q_mmr_rerank",
        "q_global_rank",
        "q_quality_deciles",
        "q_pmi_pairs",
        "q_source_divergence",
        "q_leakage_safe_split",
        "q_robust_outliers",
        "q_negative_samples",
        "q_quality_ensemble",
        "q_kmeans_assign_new",
        "q_ivfpq_topk",
        "q_resample_ffill",
        "q_resample_interp",
        "q_chisq_lang_source",
        "q_seasonal_anomaly",
        # round-11 additions
        "q_ivf_topk_exhaustive",
        "q_lake_lifecycle",
        "q_pagerank_persisted",
        "q_streaming_edge_lake",
        "q_edge_lake_compacted",
        "q_kmeans_update",
        "q_dq_observed_write",
        # round-12 additions
        "q_sparkify_artists",
        "q_pq_topk_exhaustive",
        "q_decontaminate_bloom",
        "q_shard_assignment",
        "q_shard_manifest",
        "q_random_projection",
        "q_export_pipeline",
        "q_streaming_stateful_totals",
        "q_cms_sketch",
        "q_cms_estimates",
        "q_edge_lake_time_travel",
        # round-13 additions
        "q_quantile_sketch",
        "q_quantile_estimates",
        "q_quantile_sketch_merged",
        "q_edge_lake_vacuum",
        "q_streaming_stateful_totals_tws",
        "q_bucketed_join",
        "q_table_fingerprint",
        "q_scd2_point_in_time",
        "q_interval_join",
        "q_table_diff",
        "q_triangle_count",
        "q_attribution",
        "q_edge_lake_changes",
        # round-14 additions
        "q_streaming_stateful_ttl",
        "q_quantile_saturation",
        "q_bitmap_distinct_cells",
        "q_bitmap_distinct_rollup",
        "q_weighted_quantiles",
        "q_funnel_ordered",
        "q_event_paths",
        "q_mode_deterministic",
        "q_file_skipping",
        "q_bloom_file_index",
        "q_surrogate_keys",
        # round-15 build additions, first benched in round 16 (VERDICT
        # r15 item 3: the most expensive query in the repo,
        # q_streaming_outer_join, had never been benched); their r16
        # medians are the first baseline — recorded alongside the
        # before/after probe numbers in OPTIMIZATION_r16.md
        "q_streaming_stateful_mapstate",
        "q_streaming_stateful_liststate",
        "q_streaming_stateful_warmstart",
        "q_streaming_outer_join",
        "q_bloom_join",
        "q_drift_psi",
        "q_setops_all",
        "q_recursive_cte",
        "q_bitmap_distinct_sparse",
        "q_file_skipping_combined",
    ):
        times = []
        for _ in range(REPS):  # 3 reps, matching BASELINE.md methodology
            t0 = time.perf_counter()
            # noop sink, not count(): count() lets Catalyst prune unused
            # expression subtrees (measured: q_dsir_mix's whole log-ratio
            # computation optimized away under count), so every extension
            # pays for ALL its output columns — the honest number.
            manifest[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
        # best is the cross-round comparison number (BASELINE.md method);
        # the MEDIAN is what regression adjudication reads — best-of-n
        # hides a real slowdown whenever one rep gets a quiet scheduler,
        # and VERDICT r12 found 7 apparent extension regressions that
        # were unreadable without a noise-robust statistic
        times.sort()
        extensions[name] = round(times[0], 3)
        extensions_median[name] = round(times[len(times) // 2], 3)

    shutil.rmtree(tmp, ignore_errors=True)
    total = round(sum(results.values()), 3)
    out = {
        "metric": "headline_query_total",
        "value": total,
        "unit": "sec",
        "queries": results,
        "extensions": extensions,
        "extensions_median": extensions_median,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": CPUS,
        "contention_retry": contention_retry,
        "bench_attempts": attempts,
    }
    if stock is not None:
        out["stock_queries"] = stock["queries"]
        out["stock_total"] = stock["total"]
        out["vs_stock"] = round(total / stock["total"], 3) if stock["total"] else None
    # The driver captures only the last ~2000 chars of output; the
    # extension map has grown past that, which truncated the head of
    # the one-line JSON and made it unparseable (BENCH_r07/r08 record
    # "parsed": null). Full detail goes to BENCH_DETAIL.json in the
    # repo; stdout gets a lean line that always fits the capture
    # window, with the extension TOTAL kept inline so regressions in
    # the extension set still move a driver-visible number.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(slim_output(out)))


if __name__ == "__main__":
    main()
