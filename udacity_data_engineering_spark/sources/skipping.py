"""Manifest-based data skipping — the lakehouse file-stats index
(Delta/Iceberg's min-max manifests, parquet-native; charter extension,
SURVEY.md §2B physical/W+ — the reference reads whole directories,
etl.py:31,104).

Partition pruning only skips whole directory subtrees; WITHIN a
partition, a predicate on a non-partition column still lists and opens
every file (parquet row-group stats prune IO, but the footer of every
file is still fetched — on an object store that is one GET per file, the
real 100 TB listing tax). A file-stats MANIFEST fixes this: one tiny
table of per-file (min, max, null_count, n_rows) per indexed column,
built in a single scan, stored beside the data, consulted BEFORE the
read so the plan's file list never contains a file the predicate can't
match. The win scales with layout quality: data written sorted/z-ordered
on the indexed column (physical.py sorted_layout / zorder_layout) gives
near-disjoint per-file ranges, so a point/range predicate keeps O(result)
files instead of O(all).

Driver state: the pruned FILE LIST (one string per kept file) — the same
bounded manifest read every table format's planner performs; the stats
build and the data read stay fully distributed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def build_file_stats(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-file stats manifest for ``cols``: one scan, grouped by
    input_file_name — (file, n_rows, min_/max_/nulls_ per column). At
    most one output row per FILE; write it beside the data and refresh
    incrementally on append (new files only — the manifest is additive
    because files are immutable once committed)."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    return df.groupBy(F.input_file_name().alias("file")).agg(*aggs)


def refresh_file_stats(
    spark: SparkSession, path: str, cols: Sequence[str], stats: DataFrame
) -> DataFrame:
    """Incremental manifest refresh after an APPEND: stat only the files
    the manifest hasn't seen (files are immutable once committed, so old
    rows never change — the manifest is additive). The new-file discovery
    is a DIRECTORY LISTING (Hadoop FS, one round per directory level),
    never a table scan; only genuinely-new files are read. Rows for files
    that vanished (compaction, retention) are dropped so the manifest
    never names unreadable files. File identities compare on normalized
    URIs — input_file_name and FS listings spell the scheme differently
    (file:/// vs file:/)."""

    def _norm(p: str) -> str:
        if p.startswith("file:"):
            p = p[5:]
            while p.startswith("//"):
                p = p[1:]
        return p

    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    listed: dict[str, str] = {}
    stack = [jpath]
    while stack:
        for s in fs.listStatus(stack.pop()):
            name = s.getPath().getName()
            if name.startswith(("_", ".")):
                continue
            if s.isFile():
                if name.endswith(".parquet"):
                    full = s.getPath().toString()
                    listed[_norm(full)] = full
            else:
                stack.append(s.getPath())
    known = {_norm(r["file"]): r["file"] for r in stats.select("file").collect()}
    new = sorted(listed[k] for k in listed.keys() - known.keys())
    kept = stats.filter(
        F.col("file").isin([known[k] for k in known.keys() & listed.keys()])
    )
    if not new:
        return kept
    df = spark.read.parquet(*new)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    fresh = df.groupBy(F.input_file_name().alias("file")).agg(*aggs)
    return kept.unionByName(fresh)


def prune_files(
    stats: DataFrame, col: str, lo, hi
) -> tuple[list[str], int]:
    """Consult the manifest for a closed-range predicate ``lo <= col <=
    hi``: keep files whose [min, max] envelope intersects the range.
    NULLs never match a range predicate, and a null-only file has NULL
    min/max — the comparison is NULL, not True, so it is skipped (the
    correct call, pinned in tests). Returns (kept files, total files) —
    kept is the driver-side file list handed to the reader, bounded by
    the file count like any table-format manifest read."""
    rows = stats.select(
        "file",
        (
            (F.col(f"max_{col}") >= F.lit(lo))
            & (F.col(f"min_{col}") <= F.lit(hi))
        ).alias("keep"),
    ).collect()
    kept = sorted(r["file"] for r in rows if r["keep"])
    return kept, len(rows)


def read_with_skipping(
    spark: SparkSession,
    stats: DataFrame,
    col: str,
    lo,
    hi,
    schema=None,
) -> tuple[DataFrame, int, int]:
    """Range read through the manifest: prune the file list, read ONLY
    the kept files, and re-apply the predicate exactly (stats prune at
    file granularity; rows inside a kept file still need the filter).
    Returns (frame, kept_files, total_files) so callers can assert the
    index actually pruned. ``schema`` (DDL string or StructType) is
    REQUIRED to build the empty frame when the predicate prunes every
    file — a pruned-to-zero read is routine (a range past the newest
    data), not an error."""
    kept, total = prune_files(stats, col, lo, hi)
    if not kept:
        if schema is None:
            raise ValueError(
                "predicate prunes every file; pass an explicit schema to "
                "build the empty frame"
            )
        empty = spark.createDataFrame([], schema)
        return empty, 0, total
    reader = spark.read.schema(schema) if schema else spark.read
    df = reader.parquet(*kept).filter(
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )
    return df, len(kept), total


@register(
    "q_file_skipping",
    oracle="""
        SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o_orderdate AS DATE) <= DATE '1996-06-30'
        GROUP BY 1
    """,
    doc="Manifest-based DATA SKIPPING: orders rewritten date-sorted into "
    "16 files (near-disjoint per-file date envelopes), a per-file "
    "min/max stats manifest built in one scan, then a 6-month range "
    "read consults the manifest FIRST — the plan's file list never "
    "contains a file the predicate can't match (enforced in-query: "
    "raises unless kept < total), and the predicate is re-applied "
    "exactly inside kept files. The Delta/Iceberg manifest mechanic, "
    "parquet-native; hash-proven against the plain full-scan filter.",
    tags=("physical", "sources", "W+"),
)
def q_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from udacity_data_engineering_spark.sources.parquet_source import (
        scratch_dir,
    )

    orders = table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.to_date("o_orderdate")
    )
    root = scratch_dir("file_skipping")
    path = os.path.join(root, "orders_sorted")
    # sorted layout: repartitionByRange gives each file a tight,
    # near-disjoint o_orderdate envelope — the layout data skipping pays
    # for itself on (a random layout's envelopes all span the full range)
    orders.repartitionByRange(16, "o_orderdate").sortWithinPartitions(
        "o_orderdate"
    ).write.mode("overwrite").parquet(path)

    stats = build_file_stats(spark, path, ["o_orderdate"])
    import datetime
    lo = datetime.date(1996, 1, 1)
    hi = datetime.date(1996, 6, 30)
    # schema makes the everything-pruned case (an EMPTY orders table
    # writes one row-less file whose stats prune) a valid empty result
    df, kept, total = read_with_skipping(
        spark, stats, "o_orderdate", lo, hi, schema=orders.schema
    )
    if total >= 4 and not kept < total:
        # not assert: the skipping invariant must hold under -O too
        raise RuntimeError(
            f"file skipping kept {kept}/{total} files for a 6-month range "
            "over ~7 years of sorted data — the manifest pruned nothing"
        )
    return df.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Per-file BLOOM index — the point-lookup complement to min/max skipping.
# Min/max envelopes prune RANGE predicates on clustered/sorted columns;
# an equality lookup on a high-cardinality column that is merely
# hash-clustered (every file's min/max spans the whole domain) gets
# nothing from them. A per-file Bloom filter does: k xxhash64 probes per
# value, bits packed 64/word as (file, word_idx, bits) manifest cells —
# the same cell algebra as the bitmap distinct sketch — and a lookup
# keeps only files whose bloom has ALL k probe bits set (false positives
# re-filtered exactly by the predicate; false negatives impossible).
# This is the Parquet/Delta bloom-filter-index mechanic, engine-side.
# ---------------------------------------------------------------------------


def size_bloom_bits(
    n_keys: int, n_files: int, bits_per_key: int = 12
) -> int:
    """Size a per-file Bloom filter from the table's key cardinality:
    ``bits_per_key`` bits for the expected keys-per-file, rounded up to
    a 64-bit word, floored at 8192. At k=3 probes and 12 bits/key the
    false-positive rate is ~1%; a FIXED m saturates instead — the sf1
    probe caught exactly that (150k keys / 16 files x 3 probes into
    8192 bits sets every bit, and a saturated bloom prunes nothing).
    Derive m from a countDistinct at build time; the prune side must be
    called with the same m_bits (it recomputes the same probe
    positions)."""
    per_file = max(1, -(-int(n_keys) // max(int(n_files), 1)))
    m = per_file * bits_per_key
    return max(8192, ((m + 63) // 64) * 64)


def _bloom_positions(col: str, m_bits: int, k: int) -> list:
    """k deterministic probe positions for each row's value: xxhash64 of
    (value, probe-index) mod m — salting by a literal second column gives
    k independent hashes from one function."""
    return [
        F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def build_file_blooms(
    spark: SparkSession, path: str, col: str, m_bits: int = 8192, k: int = 3
) -> DataFrame:
    """Per-file Bloom manifest cells (file, word_idx, bits) over ``col``:
    one scan; each row contributes k probe bits; cells aggregate with
    bit_or. Size: at most m_bits/64 cells per FILE regardless of rows.
    NULLs match no equality predicate and are excluded."""
    df = spark.read.parquet(path).filter(F.col(col).isNotNull())
    pos = F.explode(F.array(*_bloom_positions(col, m_bits, k))).alias("pos")
    cells = df.select(F.input_file_name().alias("file"), pos)
    word = F.expr("pos div 64")
    bit = F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))")
    return cells.groupBy("file", word.alias("word_idx")).agg(
        F.bit_or(bit).alias("bits")
    )


def prune_files_bloom(
    spark: SparkSession,
    blooms: DataFrame,
    col: str,
    value,
    value_type: str = "string",
    m_bits: int = 8192,
    k: int = 3,
) -> tuple[list[str], int]:
    """Equality-lookup pruning: a file survives only if every one of the
    value's k probe bits is set in its bloom. The probe positions are
    computed WITH THE SAME Spark expressions used at build time (one
    1-row frame — no Python reimplementation of xxhash64 to drift), so
    ``value_type`` MUST match the indexed column's type: xxhash64 of the
    long 5 and the string '5' are different bit patterns. The bit check
    runs on the manifest frame (tiny); only the kept file list is
    collected."""
    probe = spark.createDataFrame([(value,)], f"{col}: {value_type}").select(
        *_bloom_positions(col, m_bits, k)
    )
    positions = {int(p) for p in probe.first()}
    # required mask per word, from the (deduped) probe positions
    masks: dict[int, int] = {}
    for p in positions:
        w, b = p // 64, p % 64
        masks[w] = masks.get(w, 0) | (1 << b)

    def signed64(x: int) -> int:
        return x - (1 << 64) if x >= (1 << 63) else x

    total = [r["file"] for r in blooms.select("file").distinct().collect()]
    cond = None
    for w, m in masks.items():
        sm = signed64(m)
        c = (F.col("word_idx") == w) & (
            F.col("bits").bitwiseAND(F.lit(sm)) == F.lit(sm)
        )
        cond = c if cond is None else cond | c
    hits = (
        blooms.filter(cond)
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_words"))
        .filter(F.col("n_words") == len(masks))
    )
    kept = sorted(r["file"] for r in hits.collect())
    return kept, len(total)


def prune_files_combined(
    spark: SparkSession,
    stats: DataFrame,
    blooms: DataFrame,
    range_col: str,
    lo,
    hi,
    eq_col: str,
    eq_value,
    eq_type: str = "string",
    m_bits: int = 8192,
    k: int = 3,
) -> tuple[list[str], int, dict]:
    """ONE file-list pass for a conjunctive predicate
    ``lo <= range_col <= hi AND eq_col = eq_value``: consult the min/max
    manifest AND the per-file Bloom index, keep only files BOTH say may
    match (a file either index rules out cannot contain a matching row —
    intersection preserves the false-negative-impossible guarantee each
    leg has individually). Returns (kept, total, detail) where detail
    records each leg's kept count so callers can assert both legs
    actually contributed. This is what a real reader wants (VERDICT r14
    item 5): one call, one pruned list, instead of two entry points the
    caller must compose by hand."""
    kept_range, total = prune_files(stats, range_col, lo, hi)
    kept_bloom, _ = prune_files_bloom(
        spark, blooms, eq_col, eq_value, eq_type, m_bits, k
    )
    kept = sorted(set(kept_range) & set(kept_bloom))
    return kept, total, {
        "range_kept": len(kept_range),
        "bloom_kept": len(kept_bloom),
    }


def read_with_combined_skipping(
    spark: SparkSession,
    stats: DataFrame,
    blooms: DataFrame,
    range_col: str,
    lo,
    hi,
    eq_col: str,
    eq_value,
    eq_type: str = "string",
    schema=None,
    m_bits: int = 8192,
    k: int = 3,
) -> tuple[DataFrame, int, int, dict]:
    """Conjunctive read through BOTH indexes: prune with
    ``prune_files_combined``, read only surviving files, and re-apply
    the FULL predicate exactly (both indexes prune at file granularity;
    bloom false positives and in-file non-matching rows need the real
    filter). Returns (frame, kept, total, detail)."""
    kept, total, detail = prune_files_combined(
        spark, stats, blooms, range_col, lo, hi, eq_col, eq_value, eq_type,
        m_bits, k,
    )
    pred = (
        (F.col(range_col) >= F.lit(lo))
        & (F.col(range_col) <= F.lit(hi))
        & (F.col(eq_col) == F.lit(eq_value))
    )
    if not kept:
        if schema is None:
            raise ValueError(
                "predicate prunes every file; pass an explicit schema to "
                "build the empty frame"
            )
        return spark.createDataFrame([], schema), 0, total, detail
    reader = spark.read.schema(schema) if schema else spark.read
    return reader.parquet(*kept).filter(pred), len(kept), total, detail


@register(
    "q_file_skipping_combined",
    oracle="""
        SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS order_year,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_custkey = (SELECT min(o_custkey) FROM orders)
          AND CAST(o_orderdate AS DATE) >= DATE '1993-01-01'
          AND CAST(o_orderdate AS DATE) <= DATE '1995-12-31'
        GROUP BY 1
    """,
    doc="UNIFIED manifest + Bloom pruning (VERDICT r14 item 5): orders "
    "laid out clustered on (custkey bucket x order year) so BOTH "
    "indexes bite — per-file min/max date envelopes ~one year wide, "
    "each custkey confined to its bucket's files — then a conjunctive "
    "predicate (one customer AND a 3-year window) is read through ONE "
    "prune pass consulting both manifests: kept = range-survivors AND "
    "bloom-survivors, strictly fewer files than either leg alone "
    "(enforced in-query), false negatives impossible (each leg only "
    "rules out files that cannot match), false positives re-filtered "
    "exactly. Hash-proven against the full-scan filter.",
    tags=("physical", "sources", "W+"),
)
def q_file_skipping_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os

    from udacity_data_engineering_spark.sources.parquet_source import (
        scratch_dir,
    )

    orders = table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.to_date("o_orderdate")
    )
    root = scratch_dir("combined_skipping")
    path = os.path.join(root, "orders_bucket_year")
    # two-dimensional clustering: hash on (custkey%4, year) gives each
    # file a tight date envelope AND confines each custkey to ~1/4 of
    # the files — the layout where a conjunctive predicate wants BOTH
    # indexes, and neither alone is enough
    orders.repartition(
        28, F.pmod(F.col("o_custkey"), F.lit(4)), F.year("o_orderdate")
    ).write.mode("overwrite").parquet(path)

    key_stats = orders.agg(
        F.min("o_custkey").alias("k"),
        F.count_distinct("o_custkey").alias("n_keys"),
    ).first()
    target = key_stats["k"]
    if target is None:
        return spark.createDataFrame(
            [], "order_year int, n_orders long, revenue double"
        )
    # size the bloom from key cardinality: each custkey lives in ~1/4 of
    # the 28 files under the (custkey%4, year) clustering, so per-file
    # keys ~ n_keys/4 — a fixed m saturates at scale (sf1 probe lesson)
    m_bits = size_bloom_bits(key_stats["n_keys"], 4)
    stats = build_file_stats(spark, path, ["o_orderdate"])
    blooms = build_file_blooms(spark, path, "o_custkey", m_bits=m_bits)
    lo = datetime.date(1993, 1, 1)
    hi = datetime.date(1995, 12, 31)
    df, kept, total, detail = read_with_combined_skipping(
        spark, stats, blooms, "o_orderdate", lo, hi,
        "o_custkey", int(target), eq_type="bigint", schema=orders.schema,
        m_bits=m_bits,
    )
    if total >= 8 and not (
        kept < detail["range_kept"] and kept < detail["bloom_kept"]
    ):
        # not assert: the conjunctive invariant must hold under -O too
        raise RuntimeError(
            f"combined skipping kept {kept}/{total} files (range leg "
            f"{detail['range_kept']}, bloom leg {detail['bloom_kept']}) — "
            "the intersection pruned nothing beyond a single index"
        )
    return df.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "q_bloom_file_index",
    oracle="""
        SELECT o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_custkey = (SELECT min(o_custkey) FROM orders)
        GROUP BY o_orderstatus
    """,
    doc="Per-file BLOOM index point lookup: orders hash-clustered on "
    "o_custkey into 16 files (each key lives in exactly one file, but "
    "every file's min/max spans the whole domain — range skipping is "
    "useless here), a per-file bloom manifest (m SIZED from the key "
    "cardinality at ~12 bits/key so the filter never saturates at "
    "scale, 3 xxhash64 probes, <= m/64 cells/file) built in one scan, "
    "then one customer's "
    "orders are read through the index: only files whose bloom has all "
    "probe bits set are opened (false positives re-filtered exactly; "
    "false negatives impossible), enforced in-query to be a strict "
    "subset. The Parquet/Delta bloom-index mechanic, engine-side; "
    "hash-proven against the full-scan filter.",
    tags=("physical", "sources", "W+"),
)
def q_bloom_file_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from udacity_data_engineering_spark.sources.parquet_source import (
        scratch_dir,
    )

    orders = table(spark, sf_dir, "orders")
    root = scratch_dir("bloom_index")
    path = os.path.join(root, "orders_clustered")
    orders.repartition(16, "o_custkey").write.mode("overwrite").parquet(path)

    # deterministic probe key both engines agree on (the smallest
    # custkey) + the key cardinality that sizes the filter — one agg
    stats = orders.agg(
        F.min("o_custkey").alias("k"),
        F.count_distinct("o_custkey").alias("n_keys"),
    ).first()
    target = stats["k"]
    if target is None:
        return spark.createDataFrame(
            [], "o_orderstatus string, n_orders long, revenue double"
        )
    m_bits = size_bloom_bits(stats["n_keys"], 16)
    blooms = build_file_blooms(spark, path, "o_custkey", m_bits=m_bits)
    kept, total = prune_files_bloom(
        spark, blooms, "o_custkey", int(target), value_type="bigint",
        m_bits=m_bits,
    )
    if total >= 4 and not len(kept) < total:
        raise RuntimeError(
            f"bloom index kept {len(kept)}/{total} files for a single-key "
            "lookup over a hash-clustered layout — the index pruned nothing"
        )
    df = spark.read.parquet(*kept) if kept else orders.limit(0)
    return (
        df.filter(F.col("o_custkey") == target)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
