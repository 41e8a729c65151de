"""Lineage-cut helper for iterative loop operators (pagerank, connected
components) — optimization round 16, VERDICT r15 item 9.

The loops cut lineage every round so plans stay bounded. Locally the
right tool is ``localCheckpoint``: executor-local block storage, no
replication, no filesystem round-trip. Its documented trade-off is
fault posture — blocks are NOT replicated, so on a real cluster an
executor loss mid-loop kills the query (lineage is severed; nothing can
recompute the lost partitions). At 100 TB a long loop should be able to
opt into RELIABLE checkpoints instead: persisted to the checkpoint
directory (HDFS/object store), surviving executor loss, at the cost of
a write+read per cut.

``SPARK_GRAFT_RELIABLE_CHECKPOINT`` selects the posture at runtime:
unset (default) = localCheckpoint, unchanged local behavior; set to a
directory path = ``df.checkpoint()`` against that directory (set once
per SparkContext). The flag is env-scoped, not per-call, because the
posture is a property of the deployment, not of one operator call.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: Environment variable naming the reliable checkpoint directory.
RELIABLE_CHECKPOINT_ENV = "SPARK_GRAFT_RELIABLE_CHECKPOINT"


def loop_checkpoint(df: DataFrame, eager: bool = False) -> DataFrame:
    """Cut ``df``'s lineage for an iterative loop: ``localCheckpoint``
    by default, a reliable ``checkpoint`` into the directory named by
    ``$SPARK_GRAFT_RELIABLE_CHECKPOINT`` when that is set. Lazy unless
    ``eager`` — loop bodies materialize the cut with their own per-round
    aggregate (one scheduled job per round, the r15 discipline)."""
    ckpt_dir = os.environ.get(RELIABLE_CHECKPOINT_ENV)
    if not ckpt_dir:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        sc.setCheckpointDir(ckpt_dir)
    return df.checkpoint(eager=eager)
