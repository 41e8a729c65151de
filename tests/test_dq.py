"""Data-quality constraint suite (operators/dq.py) — violation paths.

The registered query runs on clean TPC-H data where every check passes;
these tests prove violations are actually counted, per constraint, and
that the whole single-table suite compiles to one aggregate over one
scan.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.dq import (
    check_suite,
    referential_check,
)


def _report(df):
    return {r.check: (r.violations, r.passed) for r in df.collect()}


def test_violations_counted_per_constraint(spark):
    df = spark.createDataFrame(
        [
            (1, "A", 10.0),
            (1, "B", -5.0),  # dup key + negative
            (2, None, 0.0),  # null name + non-positive
            (3, "Z", 7.0),  # bad domain
        ],
        "id long, status string, amount double",
    )
    rep = _report(
        check_suite(
            df,
            predicates=[
                ("status_complete", F.col("status").isNull()),
                ("amount_positive", F.col("amount") <= 0),
                ("status_domain", ~F.col("status").isin("A", "B")),
            ],
            unique_keys=[("id_unique", ["id"])],
        )
    )
    assert rep == {
        "status_complete": (1, False),
        "amount_positive": (2, False),
        # NULL status: isin -> NULL, negated stays NULL, counts as no
        # violation for the domain check (completeness owns NULLs)
        "status_domain": (1, False),
        "id_unique": (1, False),
    }


def test_all_pass_on_clean_frame(spark):
    df = spark.createDataFrame(
        [(1, "A", 1.0), (2, "B", 2.0)], "id long, status string, amount double"
    )
    rep = _report(
        check_suite(
            df,
            predicates=[("status_complete", F.col("status").isNull())],
            unique_keys=[("id_unique", ["id"])],
        )
    )
    assert rep == {"status_complete": (0, True), "id_unique": (0, True)}


def test_referential_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    rep = _report(referential_check("fk_refs_pk", child, parent, "fk", "pk"))
    assert rep == {"fk_refs_pk": (2, False)}  # both orphan ROWS counted


def test_suite_is_one_scan_one_aggregate(spark):
    """All single-table constraints must share one scan: the plan has
    exactly one FileScan-free aggregation subtree over the source —
    i.e. no unions of per-constraint jobs before the unpivot."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("k")
    )
    suite = check_suite(
        df,
        predicates=[
            ("a", F.col("id") < 0),
            ("b", F.col("k").isNull()),
        ],
        unique_keys=[("u", ["id"])],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        suite.explain("simple")
    plan = buf.getvalue()
    assert plan.count("Range (0, 100") == 1  # the source appears ONCE


def test_streaming_gate_logs_one_report_per_batch(spark, tmp_path):
    """The continuous-DQ shape: each micro-batch appends its own
    (batch_id, check, violations) report to the log, and the aggregated
    log equals the whole-feed recomputation — the split-invariance the
    registered query's oracle relies on."""
    from udacity_data_engineering_spark.streaming.event_stream import (
        stream_events,
    )

    feed = spark.createDataFrame(
        [
            (1, 1_700_000_000_000_000_000, 10, "click", 1.0, "{}"),
            (2, 1_700_000_001_000_000_000, None, "click", -3.0, "{}"),
            (3, 1_700_000_002_000_000_000, 30, "view", 2.0, "{}"),
            (4, 1_700_000_003_000_000_000, None, "view", -1.0, "{}"),
        ],
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    )
    feed_dir = str(tmp_path / "feed")
    log_dir = str(tmp_path / "log")
    feed.repartition(2, "event_id").write.parquet(feed_dir)

    def gate(batch_df, batch_id):
        check_suite(
            batch_df,
            predicates=[
                ("user_id_complete", F.col("user_id").isNull()),
                ("value_positive", F.col("value") <= 0),
            ],
        ).withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(log_dir)

    q = (
        stream_events(spark, feed_dir, max_files_per_trigger=1)
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    log = spark.read.parquet(log_dir).collect()
    batch_ids = {r.batch_id for r in log}
    assert len(batch_ids) == 2  # one report per micro-batch
    assert len(log) == 4  # 2 checks x 2 batches
    totals = {}
    for r in log:
        totals[r.check] = totals.get(r.check, 0) + r.violations
    assert totals == {"user_id_complete": 2, "value_positive": 2}


def test_empty_frame_reports_zero_violations_passed(spark):
    """A gate over zero rows has zero violations — sum() over an empty
    frame is NULL and must be coalesced, or the report says 'unknown'
    instead of 'passed' (the state a per-micro-batch monitor hits on
    every empty batch)."""
    df = spark.createDataFrame([], "id long, status string")
    rep = _report(
        check_suite(
            df,
            predicates=[("status_complete", F.col("status").isNull())],
            unique_keys=[("id_unique", ["id"])],
        )
    )
    assert rep == {"status_complete": (0, True), "id_unique": (0, True)}
