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


def all_queries() -> dict[str, Query]:
    """Import every operator module (triggering registration) and return
    the full manifest."""
    import udacity_data_engineering_spark.etl.sparkify_queries  # noqa: F401
    import udacity_data_engineering_spark.functions  # noqa: F401
    import udacity_data_engineering_spark.operators  # noqa: F401
    import udacity_data_engineering_spark.sources  # noqa: F401

    return dict(_REGISTRY)
