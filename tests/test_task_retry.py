"""Task-retry determinism: results (and sink contents) must be identical
when tasks fail and are recomputed — the everyday failure mode at 100 TB
(preemption, OOM-kills, node loss). Runs in a subprocess because retries
need a dedicated ``local[8, 2]`` master (maxFailures=2) and one JVM per
process is a Spark invariant.

The injected failure (testing.chaos_fail_first_attempt) kills the first
attempt of partition 0 in a final mapInPandas stage; Spark must retry it
and converge on exactly the multiset a clean run produces — including
through a parquet write, whose task-commit protocol must not leave the
aborted attempt's output behind.
"""

import subprocess
import sys
from pathlib import Path

CHILD = r"""
import tempfile

from pyspark.sql import SparkSession

from udacity_data_engineering_spark.session import configure
from udacity_data_engineering_spark.plans.registry import all_queries
from udacity_data_engineering_spark.testing import (
    chaos_fail_first_attempt,
    row_multiset,
)

spark = (
    SparkSession.builder.master("local[8, 2]")  # maxFailures=2: one retry
    .appName("chaos-retry")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
configure(spark)

sf = "/root/testdata/sf0.001"
m = all_queries()
q = m["q_gopher_rules"].fn  # Arrow-kernel quality pipeline over documents

clean = q(spark, sf)
cols = clean.columns
want = row_multiset([tuple(r) for r in clean.collect()], cols)
assert want, "clean run returned no rows"

# 1) collect path: retried task must reproduce its partition exactly
chaos = chaos_fail_first_attempt(q(spark, sf))
got = row_multiset([tuple(r) for r in chaos.collect()], cols)
assert got == want, "retry changed collect() results"

# 2) write path: the aborted first attempt must leave nothing behind
out = tempfile.mkdtemp(prefix="chaos_retry_") + "/w"
chaos_fail_first_attempt(q(spark, sf)).write.mode("overwrite").parquet(out)
back = spark.read.parquet(out)
got2 = row_multiset([tuple(r) for r in back.collect()], back.columns)
assert got2 == want, "retry changed written parquet contents"

print("CHAOS_OK", len(want))
"""


def test_results_identical_under_task_retry():
    out = subprocess.run(
        [sys.executable, "-c", CHILD],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(Path(__file__).resolve().parents[1]),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "CHAOS_OK" in out.stdout
    # the injection really fired: the retry path, not the happy path, ran
    assert "chaos: injected first-attempt failure" in out.stderr
