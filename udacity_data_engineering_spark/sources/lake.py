"""Lake maintenance: MERGE-style upsert into a hive-partitioned parquet
lake via dynamic partition overwrite.

The reference's sinks are full-table overwrites (reference etl.py:86,120)
— correct for a rebuild, ruinous for the production cadence of "apply
today's updates to a 100 TB lake". Without a table format (Delta/Iceberg)
the parquet-native MERGE is the dynamic-partition-overwrite pattern every
warehouse job on plain parquet uses:

1. find the partitions the update batch touches (batch-sized distinct);
2. read ONLY those partitions back (a broadcast semi-join the scan
   planner turns into partition pruning — the lake's untouched
   partitions are never opened);
3. anti-join the touched partitions' current rows against the update
   keys, union the updates in;
4. write with ``partitionOverwriteMode=dynamic``, which replaces exactly
   the partition directories present in the written frame and leaves
   every other directory byte-identical (tests/test_lake.py pins the
   untouched files by name+mtime).

Cost scales with the touched partitions + the batch, never the lake.
The overwrite option is set per-WRITE (DataFrameWriter option), never a
session-wide conf leak — same posture as the per-relation ingest policy
in sources/parquet_source.read_parquet_robust.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table
from udacity_data_engineering_spark.sources.parquet_source import (
    scratch_dir,
    write_partitioned,
)


#: directory name hive-partitioned writers use for a NULL partition value
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _sorted_partition_values(vals) -> list:
    """Deterministic ordering for collected partition values that may
    contain None (a NULL partition is legal and routine when upstream
    extractors emit nulls) — plain sorted() raises on None."""
    vals = set(vals)
    has_null = None in vals
    out = sorted(v for v in vals if v is not None)
    return out + [None] if has_null else out


def _null_safe_isin(col, values):
    """isin that also matches NULL rows when ``values`` contains None —
    isin's three-valued logic returns NULL (never true) for a NULL
    column value, silently dropping the null partition from every
    touched-partition filter otherwise."""
    nn = [v for v in values if v is not None]
    cond = col.isin(nn) if nn else F.lit(False)
    if len(nn) != len(values):
        cond = cond | col.isNull()
    return cond


def merge_upsert(
    spark: SparkSession,
    lake_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> None:
    """Upsert ``updates`` into the partitioned parquet lake at
    ``lake_dir``: rows matching on ``key_cols`` are replaced, new keys
    are inserted. Requires each update row to carry its (unchanged)
    ``partition_col`` value — a key that MOVES partitions needs the old
    partition in the touched set too, which is a table-format (Delta
    MERGE) job, and this function is documented as the parquet-native
    subset.

    The merged frame is localCheckpointed before the write: Spark
    (correctly) refuses a plan that reads and overwrites the same path,
    and the checkpoint materializes only the touched partitions + batch
    — batch-scale state, not lake-scale. A cluster deployment would use
    a staging write + rename for the same lineage cut.

    The touched-partition values are collected driver-side — bounded by
    contract (a batch touches few partitions; the PQ-codebook posture)
    and REQUIRED for pruning: a broadcast semi-join on the partition
    column does NOT trigger partition pruning on a plain parquet scan
    (measured: PartitionFilters stays [isnotnull] and every directory
    is read), while the literal ``isin`` filter prunes statically
    (tests/test_lake.py pins the plan).
    """
    affected = _sorted_partition_values(
        r[0] for r in updates.select(partition_col).distinct().collect()
    )
    # the update batch carries full rows by contract, so its schema IS
    # the lake schema — declaring it makes the read robust to a
    # file-less lake (an empty partitioned write leaves no footer to
    # infer from), turning a first-ever upsert into the bootstrap write
    current = (
        spark.read.schema(updates.schema)
        .parquet(lake_dir)
        .filter(_null_safe_isin(F.col(partition_col), affected))
    )
    merged = current.join(
        F.broadcast(updates.select(*key_cols)), key_cols, "left_anti"
    ).unionByName(updates)
    staged = merged.localCheckpoint(eager=True)
    (
        staged.repartition(partition_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(lake_dir)
    )


def merge_delete(
    spark: SparkSession,
    lake_dir: str,
    keys: DataFrame,
    key_cols: list[str],
    partition_col: str,
    schema=None,
) -> None:
    """Delete every lake row matching ``keys`` on ``key_cols`` — the
    right-to-be-forgotten / retention-expiry lake op. Unlike
    ``merge_upsert``'s batch, a deletion key set usually does NOT carry
    the partition column (you know the user ids, not where they live),
    so locating the touched partitions takes one column-pruned scan of
    (key_cols, partition_col) over the lake — the unavoidable lookup
    cost when no key→partition index exists; everything after is
    touched-partitions + keys sized.

    The edge dynamic overwrite silently gets wrong: a partition whose
    EVERY row is deleted contributes no rows to the rewrite, so dynamic
    overwrite never touches its directory and the "deleted" rows
    survive. Those fully-emptied partitions are detected (touched minus
    surviving, a tiny driver-side set) and their directories removed
    explicitly. tests/test_lake.py pins both the edge and the pruning.
    """
    # keys are key-columns only, not full rows, so the lake schema must
    # come from the caller for file-less-lake robustness; inference
    # stays the default for callers with a populated lake
    reader = spark.read.schema(schema) if schema is not None else spark.read
    lake = reader.parquet(lake_dir)
    touched = _sorted_partition_values(
        r[0]
        for r in lake.join(F.broadcast(keys), key_cols, "left_semi")
        .select(partition_col)
        .distinct()
        .collect()
    )
    if not touched:
        return
    current = lake.filter(_null_safe_isin(F.col(partition_col), touched))
    remaining = current.join(F.broadcast(keys), key_cols, "left_anti")
    staged = remaining.localCheckpoint(eager=True)
    surviving = {
        r[0] for r in staged.select(partition_col).distinct().collect()
    }
    (
        staged.repartition(partition_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(lake_dir)
    )
    emptied = [p for p in touched if p not in surviving]
    if emptied:
        # locate directories by LISTING + hive-unescape rather than by
        # constructing names: writers %XX-escape special characters
        # (':' -> %3A, '=' -> %3D, '%' -> %25 — measured), so a built
        # name would miss any partition value containing them. A NULL
        # partition lives under the hive default-partition dir.
        from urllib.parse import unquote

        want = {
            _HIVE_NULL if p is None else str(p) for p in emptied
        }
        jvm = spark._jvm
        jroot = jvm.org.apache.hadoop.fs.Path(lake_dir)
        fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
        for st in fs.listStatus(jroot):
            name = st.getPath().getName()
            if not (
                st.isDirectory()
                and name.startswith(f"{partition_col}=")
            ):
                continue
            if unquote(name.split("=", 1)[1]) in want:
                fs.delete(st.getPath(), True)


@register(
    "q_merge_delete",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderpriority,
               round(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_custkey % 50 <> 3
    """,
    doc="GDPR-style lake deletion: scrub every order belonging to a set "
    "of customers (o_custkey % 50 = 3) from the priority-partitioned "
    "parquet lake. The key set carries no partition column, so one "
    "column-pruned scan locates the touched partitions; only those are "
    "anti-joined and rewritten (dynamic overwrite), with fully-emptied "
    "partition directories removed explicitly — the edge dynamic "
    "overwrite alone silently leaves behind. Hash-proven: the "
    "re-scanned lake equals orders minus the scrubbed customers.",
    tags=("sources", "2A.20"),
)
def q_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake_dir = scratch_dir("delete_lake")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    write_partitioned(orders, lake_dir, ["o_orderpriority"])
    keys = (
        orders.filter(F.col("o_custkey") % 50 == 3)
        .select("o_custkey")
        .distinct()
    )
    merge_delete(
        spark,
        lake_dir,
        keys,
        ["o_custkey"],
        "o_orderpriority",
        schema=orders.schema,
    )
    back = spark.read.schema(orders.schema).parquet(lake_dir)
    return back.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


@register(
    "q_merge_upsert",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderpriority,
               round(CASE WHEN o_orderkey % 10 = 0
                           AND o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN o_totalprice + 1000.0
                          ELSE o_totalprice END, 2) AS o_totalprice
        FROM orders
    """,
    doc="MERGE-style upsert into a hive-partitioned parquet lake via "
    "dynamic partition overwrite: build the lake from orders partitioned "
    "by o_orderpriority, upsert a batch (every 10th key in the URGENT/"
    "HIGH partitions, price +1000), re-scan the whole lake. Only the two "
    "touched partition directories are read or rewritten — the other "
    "three are never opened (pruned scan) nor replaced (dynamic "
    "overwrite; file-level untouched-ness pinned in tests/test_lake.py). "
    "Hash-proven: the re-scanned lake equals the oracle's CASE-patched "
    "orders table.",
    tags=("sources", "2A.20"),
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake_dir = scratch_dir("merge_lake")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    # static overwrite resets the lake to base state each invocation,
    # so repeated runs in one process stay deterministic
    write_partitioned(orders, lake_dir, ["o_orderpriority"])
    updates = orders.filter(
        (F.col("o_orderkey") % 10 == 0)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
    merge_upsert(
        spark, lake_dir, updates, ["o_orderkey"], "o_orderpriority"
    )
    back = spark.read.schema(orders.schema).parquet(lake_dir)
    return back.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two table snapshots: (key_cols...,
    change_type) with change_type in {'added', 'removed', 'changed'} —
    unchanged rows are not emitted. One full-outer join on the keys;
    value comparison is per-column NULL-SAFE (a value changing to or
    from NULL is a change, never a silent equality), so the result is
    exact with no hashing in the reported path.
    """
    compare_cols = compare_cols or [
        c for c in old.columns if c not in key_cols
    ]
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_o"),
    )
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_n"),
    )
    j = o.join(n, key_cols, "full_outer")
    changed = reduce(
        or_,
        [
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
            for c in compare_cols
        ],
    )
    ct = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return j.select(*key_cols, ct.alias("change_type")).filter(
        F.col("change_type").isNotNull()
    )


def _partition_file_index(
    spark: SparkSession, root: str, partition_col: str
) -> dict:
    """{partition_value_string: frozenset((relative_path, size,
    mtime_ms))} from one recursive Hadoop FS listing of a
    hive-partitioned lake — listing-scale (file count), zero data
    read. Keys are the hive-UNESCAPED partition values (writers
    %XX-encode special characters in directory names; the unescaped
    form is what the scanned column actually contains, which the
    files-prune isin literal must match)."""
    from urllib.parse import unquote
    import os

    index: dict = {}
    local_root = root[7:] if root.startswith("file://") else root
    if "://" not in local_root and os.path.isdir(local_root):
        # local-FS fast path: one os.scandir walk — the py4j per-file
        # round trips of the generic path cost ~40µs × ~6 calls per
        # file, which DOMINATED the probe at 6,400 files (measured:
        # the "listing-scale" prune was slower than the digest scan)
        base = os.path.abspath(local_root)
        for entry in os.scandir(base):
            if not (
                entry.is_dir()
                and entry.name.startswith(f"{partition_col}=")
            ):
                continue
            part = unquote(entry.name.split("=", 1)[1])
            files = set()
            stack = [entry.path]
            while stack:
                d = stack.pop()
                for e in os.scandir(d):
                    if e.name.startswith(("_", ".")):
                        continue  # _SUCCESS / hidden metadata
                    if e.is_dir():
                        stack.append(e.path)
                    else:
                        st = e.stat()
                        files.add(
                            (
                                os.path.relpath(e.path, base),
                                st.st_size,
                                # ns // 1e6, not float-seconds * 1000:
                                # exact ms truncation, matching what the
                                # Hadoop branch's getModificationTime
                                # returns for the same file
                                st.st_mtime_ns // 1_000_000,
                            )
                        )
            index[part] = frozenset(files)
        return index
    jvm = spark._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(root)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    root_uri = fs.makeQualified(jroot).toString().rstrip("/")
    marker = f"/{partition_col}="
    it = fs.listFiles(jroot, True)
    while it.hasNext():
        st = it.next()
        path = st.getPath().toString()
        rel = path[len(root_uri):].lstrip("/")
        name = rel.rsplit("/", 1)[-1]
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS / hidden metadata never carries rows
        if marker not in path:
            continue
        part = unquote(path.split(marker, 1)[1].split("/", 1)[0])
        index.setdefault(part, set()).add(
            (rel, st.getLen(), st.getModificationTime())
        )
    return {k: frozenset(v) for k, v in index.items()}


def lake_diff(
    spark: SparkSession,
    old_dir: str,
    new_dir: str,
    key_cols: list[str],
    partition_col: str,
    prune: bool | str = "digest",
    schema=None,
) -> DataFrame:
    """snapshot_diff between two hive-partitioned parquet lake states —
    the audit/CDC primitive (what changed between yesterday's snapshot
    and today's?). At 100 TB the row-level join must not touch the
    (typically dominant) identical partitions, so two prune levels sit
    in front of it, each shrinking the next stage's input:

    - ``prune="files"``: one recursive LISTING of each side —
      listing-scale, zero data read. Parquet files are immutable and
      dynamic partition overwrite replaces whole directories, so a
      partition whose (relative path, size, mtime) file set is
      IDENTICAL on both sides is the same unmodified data (the
      production snapshot flow — metadata-preserving copy, then MERGE
      on the copy — keeps untouched directories triple-identical).
      Partitions that differ at file level fall through to the digest
      pass, so a re-written-but-equal partition (fresh mtimes, same
      rows) is still digest-skipped, never row-joined. The triple is
      the rsync-style heuristic: a file rewritten IN PLACE with
      identical size and mtime would be missed — use "digest" when
      snapshots come from an untrusted writer.
    - ``prune="digest"`` (default; ``True`` accepted): a per-partition
      digest on each (surviving) side — row count + sum of xxhash64
      over every column, summed in decimal(38,0) so it can't
      overflow-wrap — one full-column scan that shuffles one row per
      partition. Only partitions whose digests differ (or that exist
      on one side only) reach the row-level full-outer join, as a
      literal ``isin`` filter that statically prunes both scans (the
      same measured posture as merge_upsert: a semi-join does NOT
      prune a plain parquet scan). A changed partition escapes only if
      its xxhash64 SUM collides (~2^-64 per partition).
    - ``prune="none"`` (``False`` accepted): straight to the exact
      row-level join — the exact-only path tests pin every level
      against.

    Partition values are collected driver-side — bounded by the
    partition count, the merge_upsert posture.
    """
    if prune is True:
        prune = "digest"
    if prune is False:
        prune = "none"
    # a snapshot that is (or has become) file-less has no footer to
    # infer from; callers with a catalog schema pass it for robustness
    reader = spark.read.schema(schema) if schema is not None else spark.read
    old = reader.parquet(old_dir)
    new = reader.parquet(new_dir)
    if prune == "files":
        oi = _partition_file_index(spark, old_dir, partition_col)
        ni = _partition_file_index(spark, new_dir, partition_col)
        candidates = sorted(
            p
            for p in set(oi) | set(ni)
            if oi.get(p) != ni.get(p)
        )
        if not candidates:
            return snapshot_diff(
                old.filter(F.lit(False)), new.filter(F.lit(False)), key_cols
            )
        # the string directory values must be filtered as the lake's
        # partition-column TYPE; cast the literal strings through the
        # scanned column's type so numeric partitions compare correctly.
        # The hive default-partition directory is the NULL partition —
        # isin can never match it (three-valued logic), so it becomes
        # an explicit isNull arm.
        ptype = old.schema[partition_col].dataType
        nn = [c for c in candidates if c != _HIVE_NULL]
        cond = (
            F.col(partition_col).isin(*[F.lit(c).cast(ptype) for c in nn])
            if nn
            else F.lit(False)
        )
        if len(nn) != len(candidates):
            cond = cond | F.col(partition_col).isNull()
        old = old.filter(cond)
        new = new.filter(cond)
    if prune in ("files", "digest"):
        def digests(df: DataFrame) -> DataFrame:
            cols = sorted(df.columns)
            return df.groupBy(partition_col).agg(
                F.count(F.lit(1)).alias("__n"),
                F.sum(
                    F.xxhash64(*[F.col(c) for c in cols]).cast(
                        "decimal(38,0)"
                    )
                ).alias("__h"),
            )

        od = digests(old).selectExpr(
            partition_col, "__n AS __on", "__h AS __oh"
        )
        nd = digests(new).selectExpr(
            partition_col, "__n AS __nn", "__h AS __nh"
        )
        # NULL partition keys never equi-join, so an (identical) NULL
        # partition shows up one-sided on BOTH sides and lands in
        # ``differing`` — conservative: it reaches the row-level join,
        # which then correctly reports nothing for it
        both = od.join(nd, partition_col, "full_outer")
        differing = _sorted_partition_values(
            r[0]
            for r in both.filter(
                ~(
                    F.col("__on").eqNullSafe(F.col("__nn"))
                    & F.col("__oh").eqNullSafe(F.col("__nh"))
                )
            )
            .select(partition_col)
            .collect()
        )
        if not differing:
            return snapshot_diff(
                old.filter(F.lit(False)), new.filter(F.lit(False)), key_cols
            )
        old = old.filter(_null_safe_isin(F.col(partition_col), differing))
        new = new.filter(_null_safe_isin(F.col(partition_col), differing))
    return snapshot_diff(old, new, key_cols)


@register(
    "q_lake_diff",
    oracle="""
        SELECT o_orderkey, 'removed' AS change_type
        FROM orders WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT o_orderkey, 'changed'
        FROM orders WHERE o_orderkey % 97 <> 0 AND o_orderkey % 13 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, 'added'
        FROM orders WHERE o_orderkey % 89 = 0
    """,
    doc="Snapshot diff between two lake states (the audit/CDC "
    "primitive): yesterday = orders, today = orders with every 97th "
    "key deleted, every remaining 13th key's price bumped, and copies "
    "of every 89th key inserted under new keys. Both snapshots are "
    "written hive-partitioned, then diffed: per-partition digest pass "
    "first (only differing partitions reach the row-level join — here "
    "all 5 are touched by construction; the skip is pinned on crafted "
    "lakes in tests/test_lake.py), then one full-outer join on the key "
    "with per-column null-safe comparison. Hash-proven: DuckDB derives "
    "the identical (key, change_type) set from the mutation rules.",
    tags=("sources", "2A.20"),
)
def q_lake_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    old_dir = scratch_dir("diff_lake_old")
    new_dir = scratch_dir("diff_lake_new")
    write_partitioned(orders, old_dir, ["o_orderpriority"])
    new = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 13 == 0,
                F.col("o_totalprice") + F.lit(5.0),
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 89 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10000000)
            )
        )
    )
    write_partitioned(new, new_dir, ["o_orderpriority"])
    return lake_diff(
        spark,
        old_dir,
        new_dir,
        ["o_orderkey"],
        "o_orderpriority",
        schema=orders.schema,
    )


def retention_expire(
    spark: SparkSession,
    lake_dir: str,
    partition_col: str,
    expired,
) -> list[str]:
    """TTL lifecycle: drop every partition DIRECTORY whose value
    satisfies ``expired`` (a Python predicate over the directory's raw
    string value — for ISO-date partitions a plain string comparison is
    the correct ordering). One top-level listing + one recursive delete
    per expired partition: ZERO data read, cost is directory count —
    the only sane shape for "expire 90 of 36,500 day-partitions" on a
    100 TB lake (a row-level anti-join would scan everything to delete
    whole directories). Returns the dropped partition values; row-level
    retention (keys, not partitions) is merge_delete's job."""
    jvm = spark._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(lake_dir)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    from urllib.parse import unquote

    dropped = []
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(f"{partition_col}=")):
            continue
        # hive-unescape so the predicate sees the real value, not %XX
        val = unquote(name.split("=", 1)[1])
        if expired(val):
            fs.delete(st.getPath(), True)
            dropped.append(val)
    return sorted(dropped)


@register(
    "q_retention_expire",
    oracle="""
        SELECT event_id, user_id, event_type, round(value, 4) AS value,
               strftime(ts, '%Y-%m-%d') AS event_date
        FROM events
        WHERE CAST(ts AS DATE) >= DATE '2024-01-11'
    """,
    doc="Partition-level retention expiry: the events lake is written "
    "hive-partitioned by event date, the first 10 day-partitions are "
    "expired by ONE directory listing + per-partition recursive "
    "deletes (zero data read — the TTL op a 100 TB lake runs nightly), "
    "and the surviving lake is re-scanned. Hash-proven: equals events "
    "from the cutoff date on.",
    tags=("sources", "2A.20"),
)
def q_retention_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake_dir = scratch_dir("retention_lake")
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
    )
    write_partitioned(ev, lake_dir, ["event_date"])
    dropped = retention_expire(
        spark, lake_dir, "event_date", lambda d: d < "2024-01-11"
    )
    assert all(d < "2024-01-11" for d in dropped)  # empty lake drops none
    back = spark.read.schema(ev.schema).parquet(lake_dir)
    return back.select(
        "event_id",
        "user_id",
        "event_type",
        F.round("value", 4).alias("value"),
        "event_date",
    )


@register(
    "q_lake_lifecycle",
    oracle="""
        WITH base AS (
            SELECT event_id, user_id,
                   strftime(ts, '%Y-%m-%d') AS event_date
            FROM events
        )
        SELECT CAST(event_id AS BIGINT) AS event_id,
               'removed' AS change_type
        FROM base
        WHERE event_date < '2024-01-06' OR user_id % 97 = 5
        UNION ALL
        SELECT CAST(event_id AS BIGINT), 'changed'
        FROM base
        WHERE event_date >= '2024-01-06' AND user_id % 97 <> 5
          AND event_id % 10 = 0
        UNION ALL
        SELECT CAST(event_id + 100000000 AS BIGINT), 'added'
        FROM base
        WHERE event_id % 100 = 1
          AND event_date >= '2024-01-06' AND user_id % 97 <> 5
    """,
    doc="Composed lake LIFECYCLE over one physical lake directory — the "
    "nightly sequence a 100 TB lake actually runs, as ONE hash-proven "
    "query: (1) bootstrap the events lake hive-partitioned by day; "
    "(2) MERGE upsert a batch (every 10th event re-priced +1000, plus "
    "inserted late-arriving events at event_id+1e8) via dynamic "
    "partition overwrite; (3) GDPR-delete every row of the affected "
    "users (user_id % 97 = 5 — key set carries no partition column); "
    "(4) expire day-partitions before 2024-01-06 by directory delete "
    "(zero data read); (5) snapshot-diff the surviving lake against the "
    "bootstrap snapshot. The final (event_id, change_type) frame is "
    "exactly reconstructible in SQL, so the whole cross-operator "
    "composition — including directory state carried BETWEEN operators, "
    "which per-op tests cannot see — is driver-checkable. Each step is "
    "individually proven by q_merge_upsert / q_merge_delete / "
    "q_retention_expire / q_lake_diff; this catches their interactions.",
    tags=("sources", "2A.20", "lifecycle"),
)
def q_lake_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake_dir = scratch_dir("lifecycle_lake")
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
    )
    # (1) bootstrap — static overwrite resets lake state per invocation
    write_partitioned(ev, lake_dir, ["event_date"])

    # (2) MERGE upsert: updates (re-priced) + inserts (late arrivals)
    updates = ev.filter(F.col("event_id") % 10 == 0).withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    inserts = ev.filter(F.col("event_id") % 100 == 1).withColumn(
        "event_id", F.col("event_id") + F.lit(100000000).cast("long")
    )
    merge_upsert(
        spark,
        lake_dir,
        updates.unionByName(inserts),
        ["event_id"],
        "event_date",
    )

    # (3) GDPR delete by user key (no partition column in the key set)
    keys = (
        ev.filter(F.col("user_id") % 97 == 5).select("user_id").distinct()
    )
    merge_delete(
        spark, lake_dir, keys, ["user_id"], "event_date", schema=ev.schema
    )

    # (4) partition-level TTL: drop days before the cutoff, no data read
    retention_expire(
        spark, lake_dir, "event_date", lambda d: d < "2024-01-06"
    )

    # (5) snapshot diff: surviving lake vs the bootstrap snapshot
    final = spark.read.schema(ev.schema).parquet(lake_dir).select(*ev.columns)
    return snapshot_diff(ev, final, ["event_id"])
