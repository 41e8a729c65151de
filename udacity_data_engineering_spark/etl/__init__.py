from udacity_data_engineering_spark.etl import sparkify  # noqa: F401
