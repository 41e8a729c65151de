"""Physical-layout operators: bucketing and skew salting.

These are the two explicit levers the charter calls out for 100 TB joins
(SURVEY.md §2B design notes): co-locating repeated join keys via bucketed
tables (pay the shuffle once at write time, never again at read time) and
salting hot keys so a skewed aggregate/join spreads across the cluster
instead of funnelling one executor. AQE's skew-join splitting handles the
join case adaptively; explicit salting remains the tool for skewed
*aggregations* and for engines/readers without AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-ordered) catalog table.

    Joins/aggregations between tables bucketed on the same key with the
    same bucket count need NO exchange at read time — the shuffle was
    paid once at write. This is the canonical layout for a fact table
    joined on the same key by every downstream query.
    """
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def salted_key(n_salts: int) -> Column:
    """Per-row salt in [0, n_salts) — spreads a hot key across n_salts
    reducers. Derived from monotonically_increasing_id (row placement,
    NOT the key: same-key rows deliberately get different salts — that
    is the whole point)."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the large (skewed) side gets a random
    salt; the small side is replicated n_salts times; the join key
    becomes (key, salt). Output == plain join, but each hot key now
    occupies n_salts shuffle partitions instead of one.

    Only 'inner' and 'left' are valid: with the small side replicated,
    right/full/anti joins would surface the unmatched replicas as
    spurious rows. For those, salt the other way around or use AQE skew
    handling.

    Use when one side is modest (replication cost = n_salts x small) and
    AQE skew splitting isn't available/enough. For tiny dims prefer
    broadcast — salting is for the mid-size skewed case.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "replicated-side join types would emit spurious replica rows"
        )
    salted_large = large.withColumn("__salt", salted_key(n_salts))
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = salted_large.join(replicated_small, [key, "__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    n_salts: int = 8,
) -> DataFrame:
    """Two-stage skew-resistant aggregation: partial aggregate on
    (key, salt), then final aggregate on key. Only decomposable
    aggregates (sum/count/min/max) are supported — exactly the ones
    whose partial+final split is lossless."""
    allowed = {"sum", "count", "min", "max"}
    bad = set(agg_exprs.values()) - allowed
    if bad:
        raise ValueError(f"non-decomposable aggregates for salting: {bad}")
    salted = df.withColumn("__salt", salted_key(n_salts))
    partial = salted.groupBy(key, "__salt").agg(
        *[
            getattr(F, fn)(c).alias(f"__p_{c}")
            for c, fn in agg_exprs.items()
        ]
    )
    finals = []
    for c, fn in agg_exprs.items():
        refn = "sum" if fn in ("count", "sum") else fn
        finals.append(getattr(F, refn)(f"__p_{c}").alias(f"{fn}_{c}"))
    return partial.groupBy(key).agg(*finals)
