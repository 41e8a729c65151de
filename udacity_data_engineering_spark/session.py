"""Session factory + testdata table loading.

Reference parity: session bootstrap (etl.py:26-29) is a plain
``SparkSession.builder...getOrCreate()``; we add the configs a fresh context
needs for the driver's testdata (see SURVEY.md §7.2):

- ``spark.sql.legacy.parquet.nanosAsLong=true``: ``events.parquet`` stores
  ``ts`` as parquet TIMESTAMP(NANOS) which stock Spark refuses to read.
  With the flag the column arrives as int64 nanoseconds and we rebuild the
  timestamp with integer arithmetic (``ts DIV 1000`` — *integer* division;
  nanos ~1.7e18 exceed double's 2^53 exact-integer range, so float division
  would corrupt microseconds).
- UTC session timezone everywhere (deterministic date parts, oracle parity).
- AQE on (runtime coalesce / skew-join handling — the 100 TB posture).

All confs are runtime-settable so they also work on a session we did not
build (the driver hands us its own ``SparkSession``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver generates at /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Confs that are safe (and necessary) to set on an already-running session.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Arrow-batched transfer for scalar Python UDFs (Spark 4): same
    # semantics, ~row-at-a-time pickling removed. The parity UDF path
    # (functions/datetime_fns.py) benefits; builtins remain the fast path.
    "spark.sql.execution.pythonUDF.arrow.enabled": "true",
}


#: driver-process cache: the package zip shipped to executors (one per
#: process; sessions started later reuse it via addPyFile's dedup).
_PKG_ARCHIVE: str | None = None


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Python workers regardless of the
    driver's cwd/PYTHONPATH.

    Arrow kernels (mapInPandas / applyInPandas) pickle module-level
    functions BY REFERENCE, so every worker must import
    ``udacity_data_engineering_spark`` itself. When the driver process
    runs from the repo root the workers inherit that cwd and the import
    works by accident; a driver-owned session started anywhere else dies
    with ModuleNotFoundError inside the first Pandas kernel. Shipping the
    package zip via ``addPyFile`` (executor-side sys.path append) makes
    the contract location-independent — the same mechanism used to
    deploy this engine to a real cluster.
    """
    global _PKG_ARCHIVE
    try:
        sc = spark.sparkContext
        if getattr(sc, "_uds_pkg_shipped", False):
            return
        if _PKG_ARCHIVE is None:
            import shutil
            import tempfile

            pkg_dir = os.path.dirname(os.path.abspath(__file__))
            _PKG_ARCHIVE = shutil.make_archive(
                os.path.join(tempfile.gettempdir(), f"uds_pkg_{os.getpid()}"),
                "zip",
                root_dir=os.path.dirname(pkg_dir),
                base_dir=os.path.basename(pkg_dir),
            )
        sc.addPyFile(_PKG_ARCHIVE)
        sc._uds_pkg_shipped = True
    except Exception:  # pragma: no cover - read-only /tmp or locked sc
        pass  # workers may still resolve the package via cwd/PYTHONPATH


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs needed to read the testdata; idempotent."""
    _ship_package(spark)
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:  # pragma: no cover - conf locked down by host
            pass
    # The UTC session timezone is load-bearing for correctness, not just
    # hygiene: unix_millis(CAST(ts_ntz AS TIMESTAMP)) is the identity only
    # under UTC. If the host locked the conf to a non-UTC zone, timestamps
    # would silently shift — fail loudly instead. Any zero-offset zone id
    # is acceptable (a locked 'Etc/UTC' session normalizes identically).
    tz = spark.conf.get("spark.sql.session.timeZone", "")
    if not _is_utc_equivalent(tz):  # pragma: no cover - locked session only
        raise RuntimeError(
            f"spark.sql.session.timeZone is {tz!r}, not UTC-equivalent; the "
            "session rejected the conf set and timestamp normalization "
            "would be silently wrong"
        )
    return spark


def _is_utc_equivalent(tz: str) -> bool:
    """True iff the zone id has a permanent zero UTC offset — resolved via
    the IANA database (covers every alias: Etc/UTC, Etc/GMT+0, GMT0, ...)
    rather than a hand-maintained allowlist."""
    if tz in {"UTC", "Z", "+00:00", "GMT", "UT"}:
        return True
    try:
        from datetime import datetime
        from zoneinfo import ZoneInfo

        z = ZoneInfo(tz)
        return all(
            datetime(y, m, 1, tzinfo=z).utcoffset().total_seconds() == 0
            for y in (1970, 2024)
            for m in (1, 7)  # both halves of the year: no hidden DST
        )
    except Exception:
        return False


# --------------------------------------------------------------------------
# Object-store (S3A) wiring — reference parity for etl.py:12-16,26-29 +
# dl.cfg. The reference exports dl.cfg's [AWS] keys into the environment and
# pulls org.apache.hadoop:hadoop-aws; we map the same credential file onto
# fs.s3a.* confs (builder-time) or the live Hadoop configuration
# (runtime, for a session we did not build).
# --------------------------------------------------------------------------

#: hadoop-aws matching the Hadoop 3.4 line bundled with Spark 4.x.
S3A_PACKAGE = "org.apache.hadoop:hadoop-aws:3.4.1"


def load_credentials(cfg_path: str | None = None) -> dict[str, str]:
    """Read AWS credentials from a dl.cfg-style file, else the environment.

    Mirrors reference etl.py:12-16 (configparser over a ``[AWS]`` section)
    but strips surrounding quotes — the reference's dl.cfg quotes its
    values, which configparser returns verbatim and S3A then rejects.
    Returns possibly-empty strings; callers decide whether anonymous
    access is acceptable.
    """
    import configparser

    creds = {
        "access_key": os.environ.get("AWS_ACCESS_KEY_ID", ""),
        "secret_key": os.environ.get("AWS_SECRET_ACCESS_KEY", ""),
        "session_token": os.environ.get("AWS_SESSION_TOKEN", ""),
    }
    if cfg_path:
        cfg = configparser.ConfigParser()
        if not cfg.read(cfg_path):
            raise FileNotFoundError(f"credentials file not found: {cfg_path}")
        aws = cfg["AWS"] if "AWS" in cfg else cfg["DEFAULT"]

        def clean(v: str) -> str:
            return v.strip().strip("'\"")

        creds["access_key"] = clean(aws.get("AWS_ACCESS_KEY_ID", creds["access_key"]))
        creds["secret_key"] = clean(aws.get("AWS_SECRET_ACCESS_KEY", creds["secret_key"]))
        creds["session_token"] = clean(aws.get("AWS_SESSION_TOKEN", creds["session_token"]))
    return creds


def s3a_confs(
    creds: dict[str, str] | None = None,
    endpoint: str | None = None,
) -> dict[str, str]:
    """``spark.hadoop.fs.s3a.*`` confs for object-store reads/writes.

    Beyond credentials, sets the 100 TB-posture knobs: the magic committer
    (task commit via S3 multipart completion instead of O(data) directory
    renames), fast upload, and a realistic connection pool.
    """
    confs = {
        "spark.hadoop.fs.s3a.impl": "org.apache.hadoop.fs.s3a.S3AFileSystem",
        "spark.hadoop.fs.s3a.fast.upload": "true",
        "spark.hadoop.fs.s3a.connection.maximum": "96",
        "spark.hadoop.fs.s3a.threads.max": "64",
        # Safe cloud-native commit path: no rename-based commit on S3.
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
        "spark.sql.parquet.output.committer.class": "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
        "spark.sql.sources.commitProtocolClass": "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    }
    if creds:
        if creds.get("access_key"):
            confs["spark.hadoop.fs.s3a.access.key"] = creds["access_key"]
        if creds.get("secret_key"):
            confs["spark.hadoop.fs.s3a.secret.key"] = creds["secret_key"]
        if creds.get("session_token"):
            confs["spark.hadoop.fs.s3a.session.token"] = creds["session_token"]
            confs["spark.hadoop.fs.s3a.aws.credentials.provider"] = (
                "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
            )
    if endpoint:
        confs["spark.hadoop.fs.s3a.endpoint"] = endpoint
        confs["spark.hadoop.fs.s3a.path.style.access"] = "true"
    return confs


def configure_object_store(
    spark: SparkSession,
    cfg_path: str | None = None,
    endpoint: str | None = None,
) -> SparkSession:
    """Wire S3A credentials into a LIVE session (driver-owned sessions).

    ``spark.hadoop.*`` confs are builder-time only, but the underlying
    Hadoop configuration is mutable at runtime — new filesystem instances
    pick the values up. The hadoop-aws jar itself must already be on the
    classpath (builder-time ``spark.jars.packages``; see build_session).
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for key, value in s3a_confs(load_credentials(cfg_path), endpoint).items():
        if key.startswith("spark.hadoop."):
            hconf.set(key[len("spark.hadoop."):], value)
        else:
            try:
                spark.conf.set(key, value)
            except Exception:  # pragma: no cover - static SQL conf locked
                pass
    return spark


def build_session(
    app_name: str = "udacity-data-engineering-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    object_store_cfg: str | None = None,
    s3a_endpoint: str | None = None,
) -> SparkSession:
    """Create a local session tuned for this box (reference: etl.py:26-29).

    ``shuffle_partitions`` defaults to the core count: at local scale the
    stock 200 partitions just add task-scheduling overhead; on a real
    cluster this knob (and AQE coalesce) is sized to the data instead.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 8
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # catalog-table writes (bucketed tables) land in /tmp, not the
        # repo; per-process dir so stale files from a previous session
        # can't collide with managed-table locations
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_WAREHOUSE_DIR", f"/tmp/uds_warehouse_{os.getpid()}"
            ),
        )
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    if object_store_cfg is not None or s3a_endpoint is not None:
        # Reference parity (etl.py:26-29): pull hadoop-aws and wire
        # dl.cfg credentials. Requires network for ivy resolution, so it
        # is strictly opt-in; None/"" object_store_cfg means env creds.
        builder = builder.config("spark.jars.packages", S3A_PACKAGE)
        for key, value in s3a_confs(
            load_credentials(object_store_cfg or None), s3a_endpoint
        ).items():
            builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing ``events.ts`` to timestamp_ntz.

    The nanos->timestamp rebuild uses integer DIV (exact); the cast to
    TIMESTAMP_NTZ under the UTC session timezone matches how DuckDB (the
    correctness oracle) sees the column, and how the other tables'
    MILLIS/NTZ timestamps already arrive.
    """
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # FLOOR to micros (DIV truncates toward zero — wrong for pre-1970
        # sub-microsecond nanos), matching how the timestamp[us] vintage
        # would have stored the same instant.
        df = df.withColumn(
            "ts",
            F.expr(
                "CAST(timestamp_micros(ts DIV 1000 + CASE WHEN ts % 1000 < 0 "
                "THEN -1 ELSE 0 END) AS TIMESTAMP_NTZ)"
            ),
        )
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load every testdata table; optionally register temp views.

    Temp-view registration mirrors the reference's SQL entry point setup
    (etl.py:149-150 ``createOrReplaceTempView``).
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
