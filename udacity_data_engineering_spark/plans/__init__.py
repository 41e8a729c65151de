from udacity_data_engineering_spark.plans.registry import (  # noqa: F401
    Query,
    all_queries,
    register,
)
