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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-ordered) catalog table.

    Joins/aggregations between tables bucketed on the same key with the
    same bucket count need NO exchange at read time — the shuffle was
    paid once at write. This is the canonical layout for a fact table
    joined on the same key by every downstream query.

    ``path`` makes the table EXTERNAL at that location — required under
    a stock driver session whose ``spark.sql.warehouse.dir`` (static
    conf, unchangeable post-JVM) points at a cwd we may not own.
    """
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table_name}")
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
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
    aggs: list[tuple[str, str]] | dict[str, str],
    n_salts: int = 8,
) -> DataFrame:
    """Two-stage skew-resistant aggregation: partial aggregate on
    (key, salt), then final aggregate on key. Only decomposable
    aggregates (sum/count/min/max) are supported — exactly the ones
    whose partial+final split is lossless.

    ``aggs`` is a sequence of ``(column, fn)`` pairs so the same column
    can appear under several aggregates (e.g. min AND max of one price
    column) in a single two-stage pass; a ``{column: fn}`` dict is still
    accepted. Output columns are aliased ``{fn}_{column}``.
    """
    pairs = list(aggs.items()) if isinstance(aggs, dict) else list(aggs)
    allowed = {"sum", "count", "min", "max"}
    bad = {fn for _, fn in pairs} - allowed
    if bad:
        raise ValueError(f"non-decomposable aggregates for salting: {bad}")
    salted = df.withColumn("__salt", salted_key(n_salts))
    partial = salted.groupBy(key, "__salt").agg(
        *[getattr(F, fn)(c).alias(f"__p_{i}") for i, (c, fn) in enumerate(pairs)]
    )
    finals = []
    for i, (c, fn) in enumerate(pairs):
        refn = "sum" if fn in ("count", "sum") else fn
        finals.append(getattr(F, refn)(f"__p_{i}").alias(f"{fn}_{c}"))
    return partial.groupBy(key).agg(*finals)


@register(
    "q_salted_agg",
    oracle="""
        SELECT l_returnflag,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS cnt,
               round(min(l_extendedprice), 2) AS min_price,
               round(max(l_extendedprice), 2) AS max_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    doc="Skew-resistant two-stage aggregation proven against the plain "
    "GROUP BY oracle: l_returnflag has only 3 values, the canonical "
    "hot-key shape — a naive hash agg funnels each key through one "
    "reducer, while the salted partial on (key, salt) spreads every key "
    "across n_salts reducers before a tiny final agg on 3 x n_salts "
    "rows. Decomposable aggregates only (sum/count/min/max), so the "
    "two-stage split is lossless.",
    tags=("E1", "physical"),
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    out = salted_agg(
        l,
        "l_returnflag",
        [
            ("l_quantity", "sum"),
            ("l_linenumber", "count"),
            ("l_extendedprice", "min"),
            ("l_extendedprice", "max"),
        ],
        n_salts=8,
    )
    return out.select(
        "l_returnflag",
        F.round("sum_l_quantity", 2).alias("sum_qty"),
        F.col("count_l_linenumber").alias("cnt"),
        F.round("min_l_extendedprice", 2).alias("min_price"),
        F.round("max_l_extendedprice", 2).alias("max_price"),
    )


@register(
    "q_salted_join",
    oracle="""
        SELECT p.p_brand,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                   AS revenue,
               count(*) AS n_lines
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    """,
    doc="Skew-resistant salted equi-join proven against the plain join "
    "oracle: the fact side gets a row-placement salt, the part side is "
    "replicated n_salts times, and the join keys on (partkey, salt) — "
    "output rows are identical to the unsalted join (asserted by the "
    "value-hash), but a hot partkey occupies 8 shuffle partitions "
    "instead of one. The aggregate collapses the result for a stable "
    "comparison.",
    tags=("E7", "physical"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        l.withColumnRenamed("l_partkey", "p_partkey"), p, "p_partkey", n_salts=8
    )
    return joined.groupBy("p_brand").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


def sorted_layout(
    df: DataFrame, path: str, col: str, n_files: int = 8
) -> None:
    """Range-partitioned, sort-ordered parquet layout.

    ``repartitionByRange`` gives globally disjoint per-file key ranges;
    ``sortWithinPartitions`` orders rows inside each file. Result: every
    parquet footer carries tight non-overlapping min/max stats on
    ``col``, so any selective range predicate prunes whole files (and
    row groups) at scan time — the zone-map layout a 100 TB fact table
    wants on its dominant filter column. One shuffle at write time buys
    pruning on every future read.
    """
    (
        df.repartitionByRange(n_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


@register(
    "q_sorted_layout",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        FROM orders WHERE o_orderdate >= DATE '1997-01-01'
    """,
    doc="Zone-map layout: orders rewritten range-partitioned + sorted on "
    "o_orderdate, then re-read with a date range predicate — the scan "
    "skips every file whose footer min/max range misses the predicate "
    "(file-level disjointness asserted in tests/test_physical.py via "
    "parquet footers). Value-hash proven against filtering the source.",
    tags=("physical", "sources"),
)
def q_sorted_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udacity_data_engineering_spark.sources.parquet_source import scratch_dir

    out = scratch_dir("sorted_layout")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    sorted_layout(orders, out, "o_orderdate")
    return spark.read.parquet(out).filter(F.col("o_orderdate") >= "1997-01-01")


def zorder_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative int columns,
    JVM-side: spreads both dimensions' locality into one sort key so a
    range-partitioned layout prunes on EITHER column. ``bits`` bounds
    each input's rank range (values are first rank-compressed by the
    caller or assumed < 2^bits)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.lit(1 << i).cast("long")
        z = (
            z
            + F.shiftleft((a.cast("long").bitwiseAND(bit)) / bit, 2 * i).cast("long")
            + F.shiftleft((b.cast("long").bitwiseAND(bit)) / bit, 2 * i + 1).cast("long")
        )
    return z


def zorder_layout(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 8, bits: int = 16
) -> None:
    """Two-column zone-map layout: rank both columns into [0, 2^bits),
    interleave to a Morton key, range-partition + sort on it. Each file
    then covers a small rectangle of (a, b) space — selective predicates
    on either column skip most files, where a single-column sort only
    prunes its own column. The OPTIMIZE ZORDER analog for a plain
    parquet lake. Ranking bucketizes each column over its (min, max) —
    computed in one tiny aggregate, never a global-window sort (a
    partitionBy-less window would funnel the whole table through one
    task). Heavily skewed columns can pass pre-ranked inputs instead."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    n_buckets = 1 << bits

    def rank(c: str, lo, hi) -> Column:
        # width_bucket is 1-based and gives numBuckets+1 at the max edge
        return F.least(
            F.width_bucket(F.col(c), F.lit(lo), F.lit(hi), F.lit(n_buckets)) - 1,
            F.lit(n_buckets - 1),
        ).cast("long")

    ranked = df.withColumn("__ra", rank(col_a, lo_a, hi_a)).withColumn(
        "__rb", rank(col_b, lo_b, hi_b)
    )
    (
        ranked.withColumn("__z", zorder_value(F.col("__ra"), F.col("__rb"), bits))
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__ra", "__rb", "__z")
        .write.mode("overwrite")
        .parquet(path)
    )


@register(
    "q_zorder_layout",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey < 500 AND o_totalprice < 50000
    """,
    doc="Z-order (Morton-interleaved) two-column layout of orders on "
    "(o_custkey, o_totalprice), re-read with selective predicates on "
    "both — each file covers a small rectangle of the key space so "
    "either predicate prunes files (footer-stat improvement vs "
    "single-sort asserted in tests/test_physical.py). Value-hash "
    "proven against filtering the source table.",
    tags=("physical", "sources"),
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udacity_data_engineering_spark.sources.parquet_source import scratch_dir

    out = scratch_dir("zorder_layout")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zorder_layout(orders, out, "o_custkey", "o_totalprice")
    return spark.read.parquet(out).filter(
        (F.col("o_custkey") < 500) & (F.col("o_totalprice") < 50000)
    )


# --------------------------------------------------------------------------
# Runtime bloom-filter join pruning — the third explicit 100 TB join lever
# (alongside bucketing and salting above): when a selective dim filter
# feeds a shuffle join, Spark can build a bloom filter from the dim side
# and push a might_contain() predicate into the fact-side scan, pruning
# non-joining fact rows BEFORE the shuffle instead of after the join.
# At 100 TB that turns "shuffle the whole fact table" into "shuffle the
# ~selectivity fraction that can match".
# --------------------------------------------------------------------------

from contextlib import contextmanager


@contextmanager
def runtime_bloom_filters(
    spark: SparkSession,
    creation_side_threshold: str = "100MB",
    application_side_threshold: str = "10GB",
):
    """Scoped enablement of runtime bloom-filter join pruning.

    Spark injects the filter only when the creation (dim) side is under
    ``creation_side_threshold`` and the application (fact) side scan is
    over ``application_side_threshold`` — production defaults keep it off
    for small facts where the filter costs more than it saves. This is a
    context manager (not a registry query) because the thresholds are
    session-wide SQL confs: scoping restores them so the other declared
    queries keep their test-pinned plans. Plan shape is pinned in
    tests/test_physical.py::test_runtime_bloom_filter_prunes_fact_scan.
    """
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            creation_side_threshold,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold":
            application_side_threshold,
    }
    old = {}
    for k, v in keys.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def skew_report(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """(key, cnt, share, over_mean, rank): the top-``top_k`` heaviest
    values of ``key_col`` with their corpus share and multiple of the
    mean per-key count — the DIAGNOSIS that decides whether a join or
    aggregate on this key needs salting (salted_join/salted_agg above)
    or an AQE skew split, and how many salts. One hash aggregate over
    the key (partial-agg, one shuffle of one row per key per task) +
    a single tiny global-stats row broadcast into the top-k frame;
    ties break deterministically on the key value."""
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    # top-k FIRST (TakeOrderedAndProject — per-partition heaps, no
    # global sort), THEN rank: the unpartitioned window only ever sees
    # top_k rows, never the full key-count frame (which is corpus-
    # cardinality for a high-cardinality key)
    top = counts.orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(
        top_k
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    top = top.withColumn("rank", F.row_number().over(w))
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
            F.round(
                F.col("cnt") * F.col("__nkeys") / F.col("__total"), 4
            ).alias("over_mean"),
            "rank",
        )
        .orderBy("rank")
    )


@register(
    "q_skew_report",
    oracle="""
        WITH counts AS (
            SELECT lang AS key, count(*) AS cnt
            FROM documents GROUP BY lang
        ), stats AS (
            SELECT sum(cnt) AS total, count(*) AS nkeys FROM counts
        ), ranked AS (
            SELECT key, cnt,
                   row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank
            FROM counts
        )
        SELECT key, cnt,
               round(cnt / total, 6) AS share,
               round(cnt * nkeys / total, 4) AS over_mean,
               CAST(rank AS INT) AS rank
        FROM ranked, stats
        WHERE rank <= 10
    """,
    doc="Skew diagnosis: the top-10 heaviest documents.lang values with "
    "corpus share and multiple-of-mean — the report that decides "
    "whether a key needs salting (and how many salts) before a join or "
    "aggregate. One partial-agg key count + a broadcast stats row; "
    "deterministic tie-break on the key. Hash-proven: DuckDB recomputes "
    "identical counts, shares and ranks. The remedy operators are "
    "q_salted_join / q_salted_agg.",
    tags=("E1", "E7", "llm-pipeline"),
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return skew_report(table(spark, sf_dir, "documents"), "lang")


@register(
    "q_bucketed_join",
    oracle="""
        SELECT c_mktsegment,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    doc="Shuffle-free co-located join via BUCKETED catalog tables (the "
    "100 TB layout lever SURVEY §2B calls out): orders and customer are "
    "written bucketBy(8) on the customer key as external tables, and "
    "the re-read join — with broadcast disabled so co-partitioning must "
    "come from layout alone — plans ZERO Exchange nodes (enforced in "
    "the query with a RuntimeError, plan-pinned in tests/"
    "test_physical.py too). The shuffle was paid once at write time; "
    "every downstream join on that key rides for free. Result "
    "hash-proven against the plain join+aggregate oracle.",
    tags=("E7", "physical", "sources"),
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from udacity_data_engineering_spark.sources.parquet_source import scratch_dir

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    root = scratch_dir("bucketed_join")
    # FIXED per-process names/paths (ADVICE r13): a uuid per invocation
    # left the previous invocation's external files behind (DROP TABLE
    # on an external table keeps the files), accumulating 2 full table
    # copies per run until interpreter exit — the exact mkdtemp leak
    # ADVICE r1 removed from the other sinks. With fixed names the
    # overwrite-mode saveAsTable rewrites the same directories in place.
    ob_name, cb_name = f"orders_bkt_p{os.getpid()}", f"cust_bkt_p{os.getpid()}"
    write_bucketed(
        orders, ob_name, ["o_custkey"], 8,
        sort_cols=["o_custkey"], path=os.path.join(root, ob_name),
    )
    write_bucketed(
        customer, cb_name, ["c_custkey"], 8,
        sort_cols=["c_custkey"], path=os.path.join(root, cb_name),
    )
    ob, cb = spark.table(ob_name), spark.table(cb_name)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        if "Exchange" in plan:
            # not assert: the co-location invariant must hold under -O
            raise RuntimeError(
                "bucketed join planned an Exchange — bucket co-location "
                "was not honored:\n" + plan
            )
        out = (
            joined.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            )
            .localCheckpoint(eager=True)  # runs under the no-broadcast conf
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql(f"DROP TABLE IF EXISTS {ob_name}")
    spark.sql(f"DROP TABLE IF EXISTS {cb_name}")
    return out
