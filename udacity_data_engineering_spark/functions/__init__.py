from udacity_data_engineering_spark.functions.datetime_fns import (  # noqa: F401
    epoch_ms_to_ts,
    epoch_ms_to_ts_udf,
)
