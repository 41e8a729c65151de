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


def keyed_table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str],
) -> DataFrame:
    """Row-level reconciliation between two table versions: one output
    row per differing key, labeled ``added`` (key only in ``new``),
    ``removed`` (only in ``old``) or ``changed`` (present in both, any
    compared column differing — NULL-safe). Identical rows produce
    NOTHING, so output size tracks the CHANGE volume, not the table.

    This is the drill-down behind :func:`table_fingerprint`: fingerprints
    answer "are they identical" with O(1) state; when they differ, this
    answers "where" with ONE full outer join on the key — shuffle both
    sides once, no driver-side anything. At 100 TB run it per partition
    after a partition-level fingerprint pass has narrowed the scope
    (sources/lake.py's snapshot diff is that pruning layer for lakes).
    """
    k = list(keys)
    ostruct = F.struct(*[F.col(c) for c in compare]).alias("__o")
    nstruct = F.struct(*[F.col(c) for c in compare]).alias("__n")
    o = old.select(*k, ostruct, F.lit(True).alias("__in_o"))
    n = new.select(*k, nstruct, F.lit(True).alias("__in_n"))
    joined = o.join(n, k, "full_outer")
    status = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(~F.col("__o").eqNullSafe(F.col("__n")), F.lit("changed"))
    )
    return (
        joined.withColumn("diff", status)
        .filter(F.col("diff").isNotNull())
        .select(*k, "diff")
    )


@register(
    "q_table_diff",
    oracle="""
        WITH old AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            WHERE o_orderkey % 10 <> 3
        ), new AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 10 = 7
                        THEN o_totalprice + 1 ELSE o_totalprice END
                       AS o_totalprice
            FROM orders
            WHERE o_orderkey % 10 <> 5
        )
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                      OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    THEN 'changed' END AS diff
        FROM old o FULL OUTER JOIN new n USING (o_orderkey)
        WHERE CASE WHEN o.o_orderkey IS NULL THEN 'added'
                   WHEN n.o_orderkey IS NULL THEN 'removed'
                   WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                     OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                   THEN 'changed' END IS NOT NULL
    """,
    doc="Row-level table reconciliation (the drill-down behind the "
    "fingerprint): two synthetic versions of orders — keys ending in 3 "
    "added, ending in 5 removed, ending in 7 value-changed — diffed "
    "with ONE full outer join on the key; unchanged rows emit nothing, "
    "so output tracks change volume, not table size. NULL-safe struct "
    "comparison on the compared columns (IS DISTINCT FROM on both "
    "engines). Hash-proven per key+label.",
    tags=("E1", "E7", "sources", "physical"),
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter(F.col("o_orderkey") % 10 != 3)
    new = orders.filter(F.col("o_orderkey") % 10 != 5).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 7, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    return keyed_table_diff(
        old, new, keys=["o_orderkey"], compare=["o_orderstatus", "o_totalprice"]
    )
