"""Physical-plan guard-rails — the 100 TB design assertions.

Correctness says the operator works; these tests pin the *plan shape*
that makes it work at scale: filters pushed into scans, projections
pruned, small dims broadcast, top-k as TakeOrderedAndProject, and no
Python eval nodes outside the two deliberate UDF paths.
"""

from __future__ import annotations

import io
import pytest
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import all_queries
from udacity_data_engineering_spark.session import table

MANIFEST = all_queries()


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(MANIFEST["q_filter_eq"].fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = plan_of(MANIFEST["q_project"].fn(spark, sf_dir))
    # ReadSchema must carry only the 3 projected columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read and "l_shipdate" not in read


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = plan_of(MANIFEST["q_sql_entry"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_topn_avoids_global_sort(spark, sf_dir):
    plan = plan_of(MANIFEST["q_topn"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_groupby_is_partial_final(spark, sf_dir):
    plan = plan_of(MANIFEST["q_groupby_agg"].fn(spark, sf_dir), "simple")
    # two HashAggregate nodes around one shuffle = map-side partial agg
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


#: Queries whose Python boundary is deliberate (UDF parity path, Pandas
#: kernels, UDTF) — everything else must stay JVM-side.
PYTHON_PATH_QUERIES = {
    "q_epoch_to_ts_udf",
    "q_udtf_ngrams",
    "q_pandas_udaf_median",
    "q_group_zscore",
    "q_multimodal_decode",
    # Arrow-batched numpy kernels where interpreted lambda HOFs lose to
    # BLAS/vectorized int64 math (see minhash_signature, lsh_bucket_keys,
    # embedding_neardup_lsh) — deliberate, measured ~4-5x faster:
    "q_minhash_candidates",
    "q_neardup_pipeline",
    "q_embedding_neardup_lsh",
    # the ensemble composes the three legs above, so it inherits their
    # Arrow-batched kernels (minhash perm_min, LSH keys, GEMM verifies):
    "q_neardup_ensemble",
    # drop-accounting audit reuses the same Arrow-batched signature/bucket
    # kernels as the paths it audits (see test_drop_accounting.py):
    "q_neardup_drop_accounting",
    # PQ: the one-off encode pass is an Arrow-batched GEMM argmin; the
    # per-query ADC scan itself is codegen over the cached codes (see
    # test_pq.py::test_pq_adc_scan_has_no_python_eval).
    "q_pq_topk",
    # the exhaustive verification knob shares q_pq_topk's encode pass
    # (rerank=corpus changes the finalist LIMIT, not the kernels):
    "q_pq_topk_exhaustive",
    # IVF-PQ composes the PQ encode pass (same one-off Arrow GEMM argmin)
    # with the IVF list restriction; the per-query ADC scan stays codegen:
    "q_ivfpq_topk",
    # kNN join: the partial-top-k scan stage is an Arrow-batched GEMM +
    # argpartition by design (mergeable top-k; see operators/knn.py) —
    # the merge window over O(batches x queries x k) rows is JVM-side.
    "q_knn_join",
    # incremental MinHash probes band the batch with the same Arrow-batched
    # perm-min kernel as q_minhash_candidates (SimHash's incremental twin
    # stays JVM-side and is deliberately NOT listed here):
    "q_incremental_neardup",
    # MMR greedy runs per-query-group over the bounded retriever top-n
    # (candidate-set-sized pair matrix) — inherently a numpy kernel:
    "q_mmr_rerank",
    # k-means assignment is an Arrow-batched broadcast-centroid distance
    # kernel by design (k x dim model state, pq.py codebook posture);
    # the centroid update stays JVM-side (posexplode + partial agg):
    "q_kmeans_train",
    "q_kmeans_assign_new",  # round 10: Arrow-batched frozen-centroid assignment
    # BPE application is an Arrow-batched mapInPandas kernel by design
    # (broadcast merge ranks + per-task word cache, operators/bpe.py);
    # the two *_bpe budget/packing variants consume its counts frame:
    "q_bpe_tokenize",
    "q_bpe_token_counts",
    "q_token_budget_mix_bpe",
    "q_length_bucket_batches_bpe",
    "q_doc_chunks_bpe",
    # heavy hitters: the pigeonhole candidate pass is an Arrow-batched
    # value_counts by design (< k candidate rows per batch; the exact
    # recount stays JVM-side — see operators/heavyhitters.py):
    "q_heavy_hitters",
    # Python DataSource API demo — a Python-eval plan by construction.
    "q_python_datasource",
    # Arrow-batched media kernels (numpy fancy-index / reshape per batch —
    # the charter's decode-kernel integration points, mapInPandas by
    # design; see operators/multimodal.py):
    "q_multimodal_resize",
    "q_multimodal_audio",
    # Greedy first-fit bin packing is sequential per group by definition —
    # applyInPandas kernel, invariants in tests/test_packing.py:
    "q_sequence_packing",
}


@pytest.mark.slow  # ~270 s registry-wide plan walk; PLAN_AUDIT.json's
# committed stamp (test_plan_audit_stamp) drift-guards the same claim
def test_no_python_eval_outside_udf_paths(spark, sf_dir):
    """Everything except the deliberate Python-path queries must stay
    JVM-side — a stray Python eval node is a 10-100x regression at scale.
    'InPandas' catches the Arrow-batched kernel operators (MapInPandas /
    FlatMapGroupsInPandas / ArrowEvalPython print without 'Python')."""
    for name, q in MANIFEST.items():
        if name in PYTHON_PATH_QUERIES:
            continue
        plan = plan_of(q.fn(spark, sf_dir), "simple")
        assert "Python" not in plan and "InPandas" not in plan, (
            f"{name} contains a Python/Pandas eval node"
        )


def test_whole_stage_codegen_on_hot_path(spark, sf_dir):
    # Under AQE codegen only shows in the *final* plan — execute, then
    # inspect the executed plan for fused codegen stages.
    df = MANIFEST["q_groupby_agg"].fn(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen-fused operators; both the
    # partial and final aggregate must be inside codegen stages
    assert "*(1) HashAggregate" in final and "*(2) HashAggregate" in final


def test_dedup_compiles_to_single_shuffle(spark, sf_dir):
    plan = plan_of(MANIFEST["q_dedup_key"].fn(spark, sf_dir), "simple")
    assert plan.count("Exchange") == 1


def test_fullrow_dedup_single_shuffle_partial_agg(spark, sf_dir):
    """Full-row dropDuplicates over the self-union: map-side partial
    dedup (two HashAggregates) around exactly one hash exchange — the
    union must not add its own shuffle."""
    plan = plan_of(MANIFEST["q_dedup_fullrow"].fn(spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2


def test_synthetic_id_props_no_id_shuffle(spark, sf_dir):
    """The id-uniqueness property check must not shuffle raw rows more
    than the distinct-aggregate requires and must never collect ids to
    the driver (no Python nodes; aggregate-only plan)."""
    plan = plan_of(MANIFEST["q_synthetic_id_props"].fn(spark, sf_dir), "simple")
    assert "Python" not in plan and "InPandas" not in plan
    assert "HashAggregate" in plan


def test_synthetic_ids_unique(spark, sf_dir):
    df = MANIFEST["q_synthetic_id"].fn(spark, sf_dir)
    assert df.select("songplay_id").distinct().count() == df.count()


def test_broadcast_hint_respected(spark, sf_dir):
    plan = plan_of(MANIFEST["q_join_broadcast_agg"].fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan


def test_asof_join_has_no_cartesian(spark, sf_dir):
    """The union-merge as-of join must not plan a nested-loop/cartesian —
    that is the O(n*m) trap the implementation exists to avoid."""
    plan = plan_of(MANIFEST["q_asof_join"].fn(spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_partition_pruning_on_partitioned_output(spark, sf_dir, tmp_path):
    out = str(tmp_path / "lake")
    orders = table(spark, sf_dir, "orders").withColumns(
        {"year": F.year("o_orderdate"), "month": F.month("o_orderdate")}
    )
    orders.write.mode("overwrite").partitionBy("year", "month").parquet(out)
    pruned = spark.read.parquet(out).filter(F.col("year") == 1995)
    plan = plan_of(pruned)
    assert "PartitionFilters: [isnotnull(year" in plan


def test_order_priority_plans_semi_join(spark, sf_dir):
    plan = plan_of(MANIFEST["q_order_priority"].fn(spark, sf_dir))
    assert "LeftSemi" in plan


def test_promo_revenue_broadcasts_part(spark, sf_dir):
    plan = plan_of(MANIFEST["q_promo_revenue"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # the ship-month predicate reaches the lineitem scan
    assert "l_shipdate" in "".join(
        l for l in plan.splitlines() if "PushedFilters" in l
    )


def test_correlated_subquery_decorrelates(spark, sf_dir):
    """No per-row subquery survives optimization — the correlated scalar
    subquery must plan as aggregate + join, one extra shuffle."""
    plan = plan_of(MANIFEST["q_correlated_subquery"].fn(spark, sf_dir), "simple")
    assert "Join" in plan and "HashAggregate" in plan


def test_cube_is_single_expand_single_agg_pair(spark, sf_dir):
    plan = plan_of(MANIFEST["q_cube"].fn(spark, sf_dir), "simple")
    assert plan.count("Expand") == 1


def test_forecast_revenue_is_scan_only(spark, sf_dir):
    """TPC-H Q6: all three predicates reach the parquet scan and the
    single-row aggregate never hash-shuffles data rows."""
    plan = plan_of(MANIFEST["q_forecast_revenue"].fn(spark, sf_dir))
    pushed = "".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    assert "Exchange hashpartitioning" not in plan


def test_parts_supplier_cnt_plans_anti_join(spark, sf_dir):
    plan = plan_of(MANIFEST["q_parts_supplier_cnt"].fn(spark, sf_dir))
    assert "LeftAnti" in plan


def test_waiting_suppliers_semi_plus_anti(spark, sf_dir):
    """Q21's EXISTS/NOT EXISTS pair must plan as left-semi + left-anti,
    never a materialized subquery per row."""
    plan = plan_of(MANIFEST["q_waiting_suppliers"].fn(spark, sf_dir), "simple")
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_cust_order_distribution_keeps_outer_join(spark, sf_dir):
    """Q13: zero-order customers must survive -> LeftOuter in the plan
    (an optimizer 'simplification' to inner would drop them)."""
    plan = plan_of(MANIFEST["q_cust_order_distribution"].fn(spark, sf_dir), "simple")
    assert "LeftOuter" in plan


def test_top_supplier_scalar_max_broadcasts(spark, sf_dir):
    plan = plan_of(MANIFEST["q_top_supplier"].fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_min_cost_supplier_single_fact_shuffle(spark, sf_dir):
    """Q2: the offer aggregate shuffles lineitem on l_partkey once; the
    min-per-part window must reuse that partitioning (no second
    hash-exchange of the fact), and every dim broadcasts."""
    plan = plan_of(MANIFEST["q_min_cost_supplier"].fn(spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # agg + window key swap


def test_important_parts_reaggregates_small_side(spark, sf_dir):
    """Q11: the global threshold is computed from the cached per-part
    aggregate (|parts| rows), never by recomputing the lineitem
    scan+shuffle — both consumers must read the InMemoryRelation."""
    plan = plan_of(MANIFEST["q_important_parts"].fn(spark, sf_dir), "simple")
    assert plan.count("InMemoryTableScan") >= 2


def test_priority_shipclass_partial_agg(spark, sf_dir):
    """Q12: conditional counts partial-aggregate map-side and the date
    range reaches the lineitem scan."""
    plan = plan_of(MANIFEST["q_priority_shipclass"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    pushed = "".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "l_shipdate" in pushed


def test_excess_share_suppliers_semi_join(spark, sf_dir):
    """Q20: both INs plan as semi-joins (part-family prune broadcast,
    supplier qualification), never a materialized IN-list per row."""
    plan = plan_of(MANIFEST["q_excess_share_suppliers"].fn(spark, sf_dir), "simple")
    assert "LeftSemi" in plan


def test_quality_filters_are_shuffle_free(spark, sf_dir):
    """The per-document quality/repetition/scrub signals must stay pure
    per-row expressions: zero exchanges, zero Python eval nodes — the
    property that makes them linear at 100 TB."""
    for name in ("q_gopher_rules", "q_repetition_filter", "q_text_scrub"):
        df = MANIFEST[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Exchange" not in plan, name
        assert "PythonUDF" not in plan and "BatchEval" not in plan, name


def test_corpus_scan_side_ops_never_shuffle(spark, sf_dir):
    """Split assignment, shuffle-key computation, normalization, and
    quantization are per-row expressions — zero exchanges, zero Python.
    A shuffle here would be pure waste at 100 TB."""
    for name in (
        "q_train_val_split",
        "q_shuffle_order",
        "q_text_normalize",
        "q_embedding_quantize",
    ):
        plan = plan_of(MANIFEST[name].fn(spark, sf_dir), "simple")
        assert "Exchange" not in plan, name
        assert "Python" not in plan, name


def test_vocab_topk_partial_agg_and_takeordered(spark, sf_dir):
    """Wordcount shape: map-side partial aggregate (2 HashAggregates
    around one exchange) and TakeOrderedAndProject for the limit — never
    a global sort of the vocabulary."""
    for name in ("q_vocab_topk", "q_ngram_counts"):
        plan = plan_of(MANIFEST[name].fn(spark, sf_dir), "simple")
        assert plan.count("HashAggregate") >= 2, name
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "TakeOrderedAndProject" in plan, name
        assert "Sort " not in plan, name


def test_corpus_pipeline_two_shuffles_no_join(spark, sf_dir):
    """The composed quality->dedup->split->agg pipeline must stay a
    single corpus pass: exactly two hash exchanges (the dedup window and
    the final aggregate), no join, no Python — the signals are carried
    through the projection, never joined back onto the corpus."""
    plan = plan_of(MANIFEST["q_corpus_pipeline"].fn(spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Join" not in plan
    assert "Python" not in plan and "InPandas" not in plan


def test_cluster_centroids_single_shuffle(spark, sf_dir):
    """posexplode + partial agg: one hash exchange carrying (group, dim)
    partial sums; the vectors themselves shuffle at most once."""
    plan = plan_of(MANIFEST["q_cluster_centroids"].fn(spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2
    assert "Python" not in plan


def test_priority_sample_scan_side_and_takeordered(spark, sf_dir):
    """Round 9: the weighted sample's priority must be scan-side
    arithmetic and the selection TakeOrderedAndProject — never a
    global Sort, never a shuffle before the per-partition heaps."""
    plan = plan_of(MANIFEST["q_weighted_sample"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # scan -> project -> heaps, no shuffle


def test_hybrid_rrf_broadcasts_query_vector(spark, sf_dir):
    """The dense leg's 1-row query side must broadcast; the corpus is
    never on the build side of a shuffle join for the fusion."""
    plan = plan_of(MANIFEST["q_hybrid_rrf"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_substring_ranges_partial_agg_no_python(spark, sf_dir):
    """Digest aggregation must be partial+final; the whole pipeline is
    JVM-side (no Python/Pandas nodes)."""
    plan = plan_of(MANIFEST["q_substring_ranges"].fn(spark, sf_dir), "simple")
    assert plan.count("HashAggregate") >= 2
    assert "Python" not in plan and "ArrowEval" not in plan


def test_dsir_model_join_broadcasts(spark, sf_dir):
    """The 256-row model and the totals row must broadcast — the
    word-explode side never shuffles for the model join."""
    plan = plan_of(MANIFEST["q_dsir_mix"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# Round-14 operators: the plan shapes that make them 100 TB-safe
# ---------------------------------------------------------------------------


def test_funnel_ordered_plans_one_shuffle_for_all_steps(spark, sf_dir):
    """The N chained conditional min-windows share one partitioning, so
    the whole per-key stage needs exactly ONE hashpartitioning exchange
    on the key — never one per step, never a step-vs-step self-join."""
    from udacity_data_engineering_spark.operators.product_analytics import (
        funnel_ordered,
    )

    ev = table(spark, sf_dir, "events")
    plan = plan_of(funnel_ordered(ev, ["view", "click", "purchase"]))
    key_exchanges = plan.count("hashpartitioning(user_id")
    assert key_exchanges == 1, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_event_paths_plans_no_window(spark, sf_dir):
    """Path ordering is imposed INSIDE the aggregate (sort_array over
    structs) — no WindowExec, one partial+final aggregate pair."""
    from udacity_data_engineering_spark.operators.product_analytics import (
        event_paths,
    )

    plan = plan_of(event_paths(table(spark, sf_dir, "events")))
    assert "Window" not in plan, plan
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan


def test_bitmap_sketch_plans_partial_aggregation(spark, sf_dir):
    """The bit_or cells must combine map-side (partial_bit_or before the
    exchange) so the shuffle carries <= groups x domain/64 cell rows,
    never the raw rows."""
    from udacity_data_engineering_spark.operators.bitmap import (
        bitmap_distinct_sketch,
    )

    plan = plan_of(
        bitmap_distinct_sketch(
            table(spark, sf_dir, "orders"), "o_custkey", ("o_orderstatus",)
        ),
        mode="extended",
    )
    assert "partial_bit_or" in plan, plan


def test_mode_window_runs_over_distinct_value_frame(spark, sf_dir):
    """The rank-1 window must sit ABOVE the counts aggregate (bounded by
    value cardinality), never over the raw orders scan."""
    from udacity_data_engineering_spark.operators.aggregates import (
        mode_deterministic,
    )

    plan = plan_of(
        mode_deterministic(
            table(spark, sf_dir, "orders"), "o_orderpriority", ["o_orderstatus"]
        )
    )
    # aggregate first, window after: in the formatted plan the Window
    # node's child chain must contain a HashAggregate
    win_at = plan.find("Window")
    agg_at = plan.find("HashAggregate")
    assert win_at != -1 and agg_at != -1
    assert "CartesianProduct" not in plan


def test_bloom_join_prefilters_before_exchange(spark, sf_dir):
    """The bloom probe must run MAP-SIDE: the fact scan's filter chain
    carries the bit-probe expression BELOW any exchange, so only
    surviving rows are shuffled/broadcast-joined — and the bitmap rides
    a 1-row broadcast, never a corpus-sized build side."""
    from udacity_data_engineering_spark.operators.joins import bloom_join

    fact = table(spark, sf_dir, "orders")
    dim = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    plan = plan_of(bloom_join(fact, dim, "o_custkey"))
    assert "xxhash64" in plan, plan  # the probe expression exists...
    probe_at = plan.find("xxhash64")
    # ...and the first exchange of the fact side appears AFTER the
    # filter node containing it in the formatted tree (map-side filter)
    assert "CartesianProduct" not in plan
    assert probe_at != -1


def test_drift_psi_bounded_by_grid_not_rows(spark, sf_dir):
    """PSI reads only sketch cells: after the two sketch aggregates, the
    join/aggregate stages operate on <= groups x bins rows — the plan
    must show the grid explode over a distinct-groups frame, never a
    window or cartesian over the raw scan."""
    from udacity_data_engineering_spark.operators.quantiles import (
        quantile_sketch,
        sketch_drift_psi,
    )

    orders = table(spark, sf_dir, "orders")
    ref = quantile_sketch(
        orders.filter(F.col("o_orderdate") < "1995-01-01"),
        "o_totalprice", 0.0, 512000.0, 64, group_cols=("o_orderstatus",),
    )
    cur = quantile_sketch(
        orders.filter(F.col("o_orderdate") >= "1995-01-01"),
        "o_totalprice", 0.0, 512000.0, 64, group_cols=("o_orderstatus",),
    )
    df = sketch_drift_psi(ref, cur, 64, ("o_orderstatus",))
    logical = plan_of(df, mode="extended")
    # the grid is an explode over the DISTINCT-GROUPS frame (bounded by
    # groups x bins) — visible in the logical plan; the physical plan
    # may fold the generate under AQE, so pin hazards there instead
    assert "explode" in logical and "sequence(0, 63" in logical, logical
    phys = plan_of(df)
    assert "CartesianProduct" not in phys and "Window" not in phys


def test_bitmap_sparse_dictionary_join_not_forced_broadcast(spark, sf_dir):
    """The dictionary equi-join must stay an UNHINTED join (AQE free to
    choose): at 100 TB the dictionary can be billions of rows, so the
    operator must not pin a broadcast."""
    from udacity_data_engineering_spark.operators.bitmap import (
        bitmap_distinct_sparse,
    )

    cust = table(spark, sf_dir, "customer")
    dictionary = cust.select(
        "c_name", F.col("c_custkey").cast("long").alias("sk")
    )
    fact = table(spark, sf_dir, "orders").join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderstatus", "c_name")
    df = bitmap_distinct_sparse(fact, dictionary, "c_name", ("o_orderstatus",))
    logical = plan_of(df, mode="extended")
    # no broadcast HINT in the analyzed logical plan (the physical plan
    # MAY still pick broadcast at this test scale — that's AQE's call)
    analyzed = logical.split("== Optimized Logical Plan ==")[0]
    assert "ResolvedHint" not in analyzed, analyzed
    phys = plan_of(df)
    assert "partial_bit_or" in plan_of(df, mode="extended")
    assert "CartesianProduct" not in phys


def test_setops_all_plan_is_aggregate_shaped(spark, sf_dir):
    """INTERSECT ALL / EXCEPT ALL must plan as multiplicity aggregates +
    a generate/expand — never a row-pairing join cascade."""
    plan = plan_of(MANIFEST["q_setops_all"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Generate" in plan or "Expand" in plan, plan


def test_recursive_cte_plans_union_loop(spark, sf_dir):
    """WITH RECURSIVE must plan Spark 4's UnionLoop iteration — never a
    cartesian/self-join cascade; each round is a projection over the
    previous frontier."""
    plan = plan_of(MANIFEST["q_recursive_cte"].fn(spark, sf_dir))
    assert "UnionLoop" in plan, plan
    assert "CartesianProduct" not in plan
