"""Table content fingerprints — order-insensitive checksums for
replication / migration verification (charter extension, SURVEY.md §2B;
the reference has no integrity surface).

The 100 TB problem this solves: after a lake copy, an engine migration,
or a backfill, "are these two tables identical?" must not cost a
distributed sort-merge diff. An ORDER-INSENSITIVE aggregate of per-row
hashes answers it with one scan and a constant-size result: XOR and SUM
of row hashes are both commutative, associative, and partition-mergeable
(combine per-file / per-partition fingerprints without rescanning), so
two sides of a replication compare O(1) state. XOR alone is blind to
duplicated-row-pair insertions (x ^ x = 0); carrying (count, xor, sum)
closes the cheap collision classes — the same multi-accumulator trick
rsync-style tools use.

Provability: the row hash is the repo's bi-engine polynomial rolling
hash (text.rolling_hash == the q_rolling_hash oracle's list_reduce) over
a canonical row string, so DuckDB recomputes the identical fingerprint
and the driver hash-proves the operator end to end. Swap in xxhash64 for
production strength — plan shape is unchanged.

Canonicalization contract: the caller picks columns whose string casts
are engine-stable (integers, strings, explicitly-formatted dates).
Floats must be pre-formatted (round + cast) — raw double-to-string
rendering differs across engines at the exponent-notation boundary.
NULL encodes as a sentinel distinct from any value, and columns join on
an ASCII unit separator so shifted values can't alias across columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.text import rolling_hash
from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table

#: column separator / NULL sentinel for the canonical row string. The
#: unit separator (0x1f) cannot appear in the tables' own values, so
#: ("ab", "c") can never collide with ("a", "bc"); the sentinel hashes
#: differently from the empty string and from the literal "NULL".
SEP = "\x1f"
NULL_SENTINEL = "\x1f\x00"


def row_canon(cols: Sequence[Column | str]) -> Column:
    """Canonical row string: each column cast to string, NULLs encoded
    as a sentinel, joined on the unit separator. concat_ws SKIPS nulls
    (silently aliasing (a, NULL, b) with (a, b)) — the coalesce makes
    every column position explicit."""
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit(NULL_SENTINEL),
        )
        for c in cols
    ]
    return F.concat_ws(SEP, *parts)


def table_fingerprint(
    df: DataFrame,
    cols: Sequence[Column | str],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """(group..., n_rows, fp_xor, fp_sum) — one scan, one partial
    aggregate of |groups| rows, constant-size answer at any table size.
    All three accumulators merge across partitions/batches (count: add,
    xor: xor, sum: add), pinned in tests/test_integrity.py."""
    h = rolling_hash(row_canon(cols))
    g = list(group_cols)
    return (
        df.withColumn("__h", h)
        .groupBy(*g)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(__h)").alias("fp_xor"),
            F.sum("__h").alias("fp_sum"),
        )
    )


_CANON_SQL = """
            concat_ws(chr(31),
                      CAST(o_orderkey AS VARCHAR),
                      CAST(o_custkey AS VARCHAR),
                      coalesce(o_orderstatus, chr(31) || chr(0)),
                      coalesce(o_orderpriority, chr(31) || chr(0)),
                      strftime(o_orderdate, '%Y-%m-%d'))
"""
_HASH_SQL = """list_reduce(
                   list_prepend(
                       CAST(0 AS BIGINT),
                       list_transform(
                           list_filter(string_split(canon, ''), c -> c != ''),
                           c -> CAST(unicode(c) AS BIGINT))),
                   (acc, x) -> (acc * 31 + x) % 2147483647)"""


@register(
    "q_table_fingerprint",
    oracle=f"""
        WITH canon AS (
            SELECT o_orderstatus, {_CANON_SQL} AS canon
            FROM orders
        ), hashed AS (
            SELECT o_orderstatus, {_HASH_SQL} AS h FROM canon
        )
        SELECT o_orderstatus,
               count(*) AS n_rows,
               bit_xor(h) AS fp_xor,
               CAST(sum(h) AS BIGINT) AS fp_sum
        FROM hashed
        GROUP BY o_orderstatus
    """,
    doc="Order-insensitive per-group content fingerprint of the orders "
    "table (count, xor, sum of a bi-engine polynomial row hash over the "
    "canonical row string): the O(1)-state replication/migration check "
    "— compare fingerprints, not rows. One scan + a |groups|-row "
    "aggregate; partition fingerprints merge without rescanning (pinned "
    "in tests). DuckDB recomputes the identical hash fold, so the "
    "driver proves canonicalization, NULL encoding, and all three "
    "accumulators.",
    tags=("E1", "sources", "physical", "llm-pipeline"),
)
def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return table_fingerprint(
        orders,
        [
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        ],
        group_cols=("o_orderstatus",),
    )
