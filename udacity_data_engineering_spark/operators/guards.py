"""Scale guards for oracle-shape queries.

A few registered queries are deliberate ground-truth shapes whose cost is
quadratic in the input (all-pairs theta self-join, inverted-index self-join
with hot-key fan-out). They exist to validate the scale-safe approximations
(`q_embedding_neardup_lsh`, `q_minhash_candidates`) and are correct at the
driver's sf0.01 — but must never run on a 100 TB corpus. ``oracle_scale_guard``
makes that a hard error instead of a cluster-melting surprise.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: Default row ceiling for oracle-only quadratic queries. sf0.1 documents /
#: embeddings are 5000 / 2000 rows, so every test scale factor passes; a real
#: corpus does not. Override via SPARK_GRAFT_ORACLE_MAX_ROWS for controlled
#: ground-truth runs at larger sizes.
ORACLE_ONLY_MAX_ROWS = 100_000


def oracle_scale_guard(df: DataFrame, query_name: str, scale_path: str) -> DataFrame:
    """Refuse to build a quadratic oracle plan over a large input.

    Counts the input (metadata-cheap on parquet) and raises if it exceeds
    the ceiling, naming the linear-shuffle alternative the caller should
    use instead. Returns ``df`` unchanged when within bounds.
    """
    limit = int(os.environ.get("SPARK_GRAFT_ORACLE_MAX_ROWS", ORACLE_ONLY_MAX_ROWS))
    n = df.count()
    if n > limit:
        raise RuntimeError(
            f"{query_name} is an oracle-only ground-truth shape with quadratic "
            f"worst-case cost; input has {n} rows (> {limit}). Use {scale_path} "
            f"at scale, or raise SPARK_GRAFT_ORACLE_MAX_ROWS to force."
        )
    return df
