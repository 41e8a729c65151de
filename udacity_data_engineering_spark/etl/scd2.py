"""Slowly-changing dimension, type 2 — versioned dimension rows.

The reference's users dim keeps only the latest level per user (B7-fixed
semantics, sparkify.build_users). SCD2 is the warehouse-grade upgrade:
every change closes the previous version (valid_to) and opens a new one
(valid_from, valid_to=NULL for current), so facts can join to the
dimension *as of* their event time — which is exactly the as-of join
(operators/asof.py) over (key, valid_from).

Plan shape: one window over the change batch + one broadcast-able join
against the changed keys; the dimension is never scanned per change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str = "ts",
    attrs: list[str] | None = None,
) -> DataFrame:
    """Apply a change batch to an SCD2 dimension.

    ``dim`` columns: key, *attrs, valid_from, valid_to (NULL = current).
    ``changes`` columns: key, *attrs, ts_col. Multiple changes per key in
    one batch chain correctly (each version's valid_to = next change's
    ts via lead()).
    """
    attrs = attrs or [
        c for c in changes.columns if c not in (key, ts_col)
    ]
    versions = changes.select(
        key, *attrs, F.col(ts_col).alias("valid_from")
    ).withColumn(
        "valid_to", F.lead("valid_from").over(
            Window.partitionBy(key).orderBy("valid_from")
        )
    )
    first_change = changes.groupBy(key).agg(F.min(ts_col).alias("__first_ts"))
    closed = (
        dim.join(first_change, key, "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("valid_to").isNull() & F.col("__first_ts").isNotNull(),
                F.col("__first_ts"),
            ).otherwise(F.col("valid_to")),
        )
        .drop("__first_ts")
    )
    return closed.unionByName(versions.select(*closed.columns))


def current_view(dim: DataFrame) -> DataFrame:
    """The type-1 projection of an SCD2 dimension: current rows only."""
    return dim.filter(F.col("valid_to").isNull())
