"""Every SQL oracle's OUTPUT schema must contain only Spark-width types.

DuckDB widens integer sum() to HUGEINT (int128) and offers unsigned and
ns/ms/s-width timestamp types — none of which exist in Spark. The driver's
value hash is TYPE-sensitive while DuckDB's Python fetchall() flattens
HUGEINT to plain int, so a repr-based local compare passes oracles the
driver fails (this cost rounds 10 and 11 one red cell each; VERDICT r11
"What's wrong" #1/#2). This test closes the class: it types every
registered oracle from the DuckDB relation PLAN (no execution, so the
whole registry checks in seconds) and fails on any forbidden output type.

Fix for a red entry: CAST the offending output column in the oracle SQL
(e.g. ``CAST(sum(x) AS BIGINT)``) — never change the Spark side to match
DuckDB's widening.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

from udacity_data_engineering_spark.plans.registry import all_queries
from udacity_data_engineering_spark.session import TABLES
from udacity_data_engineering_spark.testing import oracle_type_problems

SF_DIR = Path("/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def _oracled():
    return sorted(
        (name, q.oracle)
        for name, q in all_queries().items()
        if q.oracle is not None
    )


def test_registry_has_oracles():
    assert len(_oracled()) >= 200  # drift guard: the registry shrank?


@pytest.mark.parametrize("name,oracle", _oracled(), ids=lambda v: v if isinstance(v, str) and v.startswith("q_") else None)
def test_oracle_output_types_are_spark_width(con, name, oracle):
    rel = con.sql(oracle)  # plan-only: types come from the binder
    problems = oracle_type_problems(rel.columns, rel.types)
    assert not problems, f"{name}: " + "; ".join(problems)
