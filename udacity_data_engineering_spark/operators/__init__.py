"""Operator modules. Importing this package registers every declared query
in the plans registry (see plans/registry.py)."""

from udacity_data_engineering_spark.operators import (  # noqa: F401
    aggregates,
    analytics,
    analytics2,
    analytics3,
    ann,
    asof,
    dedup,
    joins,
    multimodal,
    neardup,
    pandas_ops,
    physical,
    product_analytics,
    relational,
    sampling,
    similarity,
    sql_surface,
    sql_surface2,
    sql_surface3,
    sql_surface4,
    stats,
    text,
    udf_surface,
    windows,
)
