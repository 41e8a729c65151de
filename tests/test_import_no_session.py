"""Regression guard: the full package (and query manifest) must import
WITHOUT a SparkSession/JVM. Python UDF workers re-import these modules
inside tasks where no session exists — any module-scope Column, DDL-typed
pandas_udf/udtf, or other JVM-touching code breaks every Pandas-UDF query
at runtime (happened twice: analytics._REVENUE, udf_surface pandas_udf).
"""

import subprocess
import sys


def test_package_imports_without_session():
    code = (
        "from udacity_data_engineering_spark.plans.registry import all_queries; "
        "m = all_queries(); "
        "assert len(m) >= 55, len(m); "
        "import udacity_data_engineering_spark.etl.sparkify; "
        "import udacity_data_engineering_spark.streaming; "
        "print('IMPORT_OK', len(m))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=str(__import__("pathlib").Path(__file__).resolve().parents[1]),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "IMPORT_OK" in out.stdout
