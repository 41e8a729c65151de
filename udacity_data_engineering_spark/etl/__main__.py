"""``python -m udacity_data_engineering_spark.etl`` — Sparkify ETL CLI.

Avoids the runpy double-import warning of running the submodule directly
(etl/__init__ imports sparkify for registration side effects).
"""

from udacity_data_engineering_spark.etl.sparkify import main

if __name__ == "__main__":
    main()
