"""Mergeable quantile sketch — fixed-boundary histogram summaries, the
third leg of the sketch warehouse (HLL = distinct, CMS = frequency,
this = quantiles; charter extension, SURVEY.md §2B — the reference has
no aggregation surface beyond count, etl.py:188).

A 100 TB deployment can't sort to answer "p99 latency per day"; it keeps
a per-partition/per-day summary and merges. GK/KLL sketches do this with
adaptive boundaries, but their compaction is rank-order-dependent —
unprovable against a SQL oracle. A FIXED-grid histogram has the same
warehouse algebra (cells are counts → merge is elementwise SUM, fully
associative and commutative) with deterministic, engine-independent cell
assignment, so DuckDB recomputes the identical sketch and the driver
hash-proves both the cells and the derived quantile estimates — the CMS
provability posture (cms.py). The price is a fixed value domain
[lo, hi) and a rank-independent error bound: every estimate is within
one bin width of the true quantile (pinned in tests/test_quantiles.py),
vs GK's rank-relative eps*n. For curation metrics with known domains
(lengths, scores, prices), the fixed grid is the right trade.

Scale shape: one scan + one partial-aggregating shuffle of at most
``groups x n_bins`` cells; estimates read only the sketch (never the
data), so a year of daily sketches answers any percentile question with
zero raw-data IO.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def bin_of(value: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Dense bin id for ``value`` on the fixed grid: floor((x-lo)/width)
    clamped into [0, n_bins-1], so out-of-domain values land in the edge
    bins instead of corrupting the cell space (their estimates then
    saturate at the domain edge — deterministic, never wrong cells)."""
    width = (hi - lo) / n_bins
    raw = F.floor((value - F.lit(lo)) / F.lit(width))
    return F.least(
        F.greatest(raw, F.lit(0).cast("long")), F.lit(n_bins - 1).cast("long")
    ).cast("int")


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
    group_cols: Sequence[str] = (),
    weight_col: str | None = None,
) -> DataFrame:
    """Histogram sketch cells (group..., bin, cnt) over the fixed grid —
    at most ``|groups| * n_bins`` rows at any input size. NULL values
    carry no rank information and are excluded. Cells are additive:
    per-partition / per-batch / per-day sketches merge with
    :func:`merge_quantile_sketches` (elementwise sum).

    ``weight_col`` makes the sketch WEIGHTED: each row contributes its
    weight instead of 1, so :func:`quantile_estimates` answers weighted
    quantiles (token-weighted length percentiles, quantity-weighted
    price percentiles) with the identical merge algebra. Weights are
    cast to long — integer sums are order-independent and exactly
    reproducible across engines, which keeps the sketch hash-provable;
    quantize fractional weights upstream (e.g. milli-units) rather than
    summing floats in a different order on every run. Rows with NULL or
    non-positive weight carry no rank mass and are excluded."""
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    g = list(group_cols)
    src = df.filter(F.col(value_col).isNotNull())
    if weight_col is None:
        mass = F.count(F.lit(1))
    else:
        src = src.filter(F.col(weight_col) > 0)
        mass = F.sum(F.col(weight_col).cast("long"))
    return (
        src.select(
            *g,
            bin_of(F.col(value_col), lo, hi, n_bins).alias("bin"),
            *( [F.col(weight_col)] if weight_col else [] ),
        )
        .groupBy(*g, "bin")
        .agg(mass.alias("cnt"))
    )


def derive_quantile_domain(df: DataFrame, value_col: str) -> tuple[float, float]:
    """Derive a [lo, hi) grid domain covering every non-null value: ONE
    min/max aggregate (driver state = two floats), hi padded past the max
    so the maximum lands inside the last bin rather than on the open
    boundary. The answer to the fixed grid's operational hazard (ADVICE
    r13): a mis-guessed domain silently saturates out-of-range values
    into the edge bins; deriving it from the data makes the common case
    correct by construction (pair with :func:`saturation_counts` when the
    sketch must outlive the batch that sized it)."""
    row = df.agg(
        F.min(F.col(value_col).cast("double")).alias("mn"),
        F.max(F.col(value_col).cast("double")).alias("mx"),
    ).first()
    mn, mx = row["mn"], row["mx"]
    if mn is None:
        raise ValueError(
            f"cannot derive a quantile domain: {value_col} has no "
            "non-null values"
        )
    span = mx - mn
    pad = span / 1024 if span > 0 else 1.0
    return float(mn), float(mx + pad)


def saturation_counts(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-group accounting of values OUTSIDE the grid domain [lo, hi):
    (group..., n_below, n_above, n_total). Out-of-domain values saturate
    into the edge bins deterministically (bin_of clamps), which keeps the
    cells valid but biases edge-bin quantile estimates — this one extra
    partial aggregate makes a mis-specified domain VISIBLE instead of
    silent: alert when n_below + n_above exceeds the error budget, then
    re-derive the domain (:func:`derive_quantile_domain`) and resketch."""
    v = F.col(value_col)
    g = list(group_cols)
    return (
        df.filter(v.isNotNull())
        .groupBy(*g)
        .agg(
            F.count(F.when(v < F.lit(lo), 1)).alias("n_below"),
            F.count(F.when(v >= F.lit(hi), 1)).alias("n_above"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


def merge_quantile_sketches(*sketches: DataFrame) -> DataFrame:
    """Merge any number of sketches over the SAME grid: union + sum per
    cell. Associative and commutative by construction (integer addition),
    so merge order and batch split never change the result — the property
    that makes the sketch a warehouse object (pinned in tests)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    keys = [c for c in merged.columns if c != "cnt"]
    return merged.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def quantile_estimates(
    sketch: DataFrame,
    qs: Sequence[float],
    lo: float,
    hi: float,
    n_bins: int = 64,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Quantile estimates from the sketch alone: for each q, the upper
    edge of the first bin whose cumulative count reaches q*n —
    ``est = lo + width * (k+1)`` with ``k = min{bin : cum(bin) >= q*n}``.
    The true q-quantile lies in (est - width, est] whenever the data fits
    the domain, so the absolute error is bounded by one bin width.

    The cumulative scan keys on the BIN ID, not the (possibly sparse)
    cell row position — empty bins must not shift the estimate. Windows
    are per-group over at most n_bins rows; with no groups the sketch is
    a single <= n_bins-row frame, so the single-partition window is
    bounded by construction, never by the data."""
    width = (hi - lo) / n_bins
    g = list(group_cols)
    w_cum = (
        Window.partitionBy(*g)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*g)
    cum = sketch.withColumn("__cum", F.sum("cnt").over(w_cum)).withColumn(
        "__n", F.sum("cnt").over(w_all)
    )
    exploded = cum.select(
        *g,
        "bin",
        "__cum",
        "__n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    k = F.min(F.when(F.col("__cum") >= F.col("q") * F.col("__n"), F.col("bin")))
    return exploded.groupBy(*g, "q").agg(
        (F.lit(lo) + F.lit(width) * (k + 1).cast("double")).alias("est")
    )


# Registered grid for the orders.o_totalprice demo: the synthetic domain
# is ~[1e3, 5e5); 64 bins over [0, 512000) gives an exactly-representable
# width of 8000.0 (both engines compute identical bin ids on exact
# doubles). These constants appear verbatim in the oracle SQL — in sync.
_LO, _HI, _BINS = 0.0, 512000.0, 64
_WIDTH = (_HI - _LO) / _BINS
_QS = (0.5, 0.9, 0.99)

_CELLS_SQL = f"""
        SELECT o_orderstatus,
               CAST(LEAST(GREATEST(floor((o_totalprice - {_LO}) / {_WIDTH}), 0),
                          {_BINS - 1}) AS INT) AS bin
        FROM orders
        WHERE o_totalprice IS NOT NULL
"""


@register(
    "q_quantile_sketch",
    oracle=f"""
        WITH cells AS ({_CELLS_SQL})
        SELECT o_orderstatus, bin, count(*) AS cnt
        FROM cells
        GROUP BY o_orderstatus, bin
    """,
    doc="Mergeable quantile sketch (fixed-grid histogram, 64 bins over "
    "[0, 512000)) of order totals per status: at most groups x 64 cells "
    "at any scale, one partial-aggregating shuffle, cells additive so "
    "per-batch sketches merge by summing — the warehouse object a 100 TB "
    "percentile rollup actually stores. Grid assignment is engine-"
    "independent double arithmetic, so DuckDB rebuilds the identical "
    "sketch and the driver hash-proves it (the CMS posture).",
    tags=("E1", "E2", "llm-pipeline", "sketch"),
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return quantile_sketch(
        orders, "o_totalprice", _LO, _HI, _BINS, group_cols=("o_orderstatus",)
    )


@register(
    "q_quantile_estimates",
    oracle=f"""
        WITH cells AS ({_CELLS_SQL}),
        sk AS (
            SELECT o_orderstatus, bin, count(*) AS cnt
            FROM cells GROUP BY o_orderstatus, bin
        ),
        cum AS (
            SELECT o_orderstatus, bin,
                   sum(cnt) OVER (PARTITION BY o_orderstatus ORDER BY bin)
                       AS c,
                   sum(cnt) OVER (PARTITION BY o_orderstatus) AS n
            FROM sk
        )
        SELECT o_orderstatus,
               CAST(q AS DOUBLE) AS q,
               {_LO} + {_WIDTH} * CAST(
                   min(CASE WHEN c >= CAST(q AS DOUBLE) * n THEN bin END) + 1
                   AS DOUBLE) AS est
        FROM cum
        CROSS JOIN (VALUES (0.5), (0.9), (0.99)) AS qq(q)
        GROUP BY o_orderstatus, q
    """,
    doc="p50/p90/p99 of order totals per status answered from the SKETCH "
    "alone (zero raw-data IO): est = upper edge of the first bin whose "
    "cumulative count reaches q*n, keyed on the dense bin id so sparse "
    "cells never shift the answer; |est - true quantile| <= one bin "
    "width (8000), pinned in tests. Windows run per group over <= 64 "
    "sketch rows. Both the sketch and the estimate arithmetic are "
    "recomputed independently in DuckDB.",
    tags=("E1", "E2", "llm-pipeline", "sketch"),
)
def q_quantile_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    sk = quantile_sketch(
        orders, "o_totalprice", _LO, _HI, _BINS, group_cols=("o_orderstatus",)
    )
    return quantile_estimates(
        sk, _QS, _LO, _HI, _BINS, group_cols=("o_orderstatus",)
    )


@register(
    "q_quantile_sketch_merged",
    oracle=f"""
        WITH cells AS ({_CELLS_SQL})
        SELECT o_orderstatus, bin, count(*) AS cnt
        FROM cells
        GROUP BY o_orderstatus, bin
    """,
    doc="Sketch MERGE as a driver-proven fact, not just a pytest: the "
    "orders table is split into four disjoint ingest slices (orderkey "
    "mod 4 — the per-batch/per-day shape a warehouse actually sees), "
    "each slice sketched independently, the four sketches merged by "
    "elementwise cell sum — and the merged sketch hash-matches the same "
    "oracle as the whole-table sketch. This is the property that lets a "
    "100 TB deployment keep per-partition summaries and never rescan.",
    tags=("E1", "E2", "llm-pipeline", "sketch"),
)
def q_quantile_sketch_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    slices = [
        quantile_sketch(
            orders.filter(F.pmod(F.col("o_orderkey"), F.lit(4)) == i),
            "o_totalprice",
            _LO,
            _HI,
            _BINS,
            group_cols=("o_orderstatus",),
        )
        for i in range(4)
    ]
    return merge_quantile_sketches(*slices)


@register(
    "q_quantile_saturation",
    oracle="""
        SELECT o_orderstatus,
               count(CASE WHEN o_totalprice < 0.0 THEN 1 END) AS n_below,
               count(CASE WHEN o_totalprice >= 256000.0 THEN 1 END)
                   AS n_above,
               count(*) AS n_total
        FROM orders
        WHERE o_totalprice IS NOT NULL
        GROUP BY o_orderstatus
    """,
    doc="Sketch-domain saturation accounting (ADVICE r13): per status, "
    "how many order totals fall OUTSIDE a deliberately-narrow grid "
    "domain [0, 256000) — the values bin_of would clamp into the edge "
    "bins. One partial aggregate alongside the sketch; n_above > 0 here "
    "by construction, demonstrating the mis-specified-domain alarm. The "
    "repair loop is derive_quantile_domain (one min/max aggregate) + "
    "resketch, pinned in tests/test_quantiles.py.",
    tags=("E1", "E2", "llm-pipeline", "sketch"),
)
def q_quantile_saturation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return saturation_counts(
        orders, "o_totalprice", 0.0, 256000.0, group_cols=("o_orderstatus",)
    )


# Weighted grid for lineitem.l_extendedprice (domain ~[900, 105000)):
# 64 bins over [0, 131072) gives an exactly-representable width of
# 2048.0. Weight = l_quantity (integral 1..50 in TPC-H), so the weighted
# quantile is "the price at which q of the QUANTITY mass clears".
_WLO, _WHI, _WBINS = 0.0, 131072.0, 64
_WWIDTH = (_WHI - _WLO) / _WBINS


@register(
    "q_weighted_quantiles",
    oracle=f"""
        WITH cells AS (
            SELECT l_returnflag,
                   CAST(LEAST(GREATEST(
                       floor((l_extendedprice - {_WLO}) / {_WWIDTH}), 0),
                       {_WBINS - 1}) AS INT) AS bin,
                   CAST(l_quantity AS BIGINT) AS w
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL AND l_quantity > 0
        ),
        sk AS (
            SELECT l_returnflag, bin, sum(w) AS cnt
            FROM cells GROUP BY l_returnflag, bin
        ),
        cum AS (
            SELECT l_returnflag, bin,
                   sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin)
                       AS c,
                   sum(cnt) OVER (PARTITION BY l_returnflag) AS n
            FROM sk
        )
        SELECT l_returnflag,
               CAST(q AS DOUBLE) AS q,
               {_WLO} + {_WWIDTH} * CAST(
                   min(CASE WHEN c >= CAST(q AS DOUBLE) * n THEN bin END) + 1
                   AS DOUBLE) AS est
        FROM cum
        CROSS JOIN (VALUES (0.5), (0.9), (0.99)) AS qq(q)
        GROUP BY l_returnflag, q
    """,
    doc="WEIGHTED quantile sketch: p50/p90/p99 of lineitem price per "
    "return flag, weighted by quantity — 'the price at which q of the "
    "shipped-unit mass clears', the weighted percentile every "
    "token-weighted curation metric needs (doc-length percentiles "
    "weighted by token count are the same shape). Each row contributes "
    "its integer weight to its bin; same <= groups x 64-cell shuffle, "
    "same elementwise-sum merge algebra, integer mass so both engines "
    "sum exactly. Sketch + estimate arithmetic recomputed in DuckDB.",
    tags=("E1", "E2", "llm-pipeline", "sketch"),
)
def q_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    sk = quantile_sketch(
        li,
        "l_extendedprice",
        _WLO,
        _WHI,
        _WBINS,
        group_cols=("l_returnflag",),
        weight_col="l_quantity",
    )
    return quantile_estimates(
        sk, _QS, _WLO, _WHI, _WBINS, group_cols=("l_returnflag",)
    )


def sketch_drift_psi(
    ref: DataFrame,
    cur: DataFrame,
    n_bins: int,
    group_cols: Sequence[str] = (),
    eps: float = 0.5,
) -> DataFrame:
    """Population Stability Index between two quantile sketches over the
    SAME grid — the distribution-drift monitor (the standard ML/feature
    monitoring statistic: PSI < 0.1 stable, 0.1-0.25 moderate shift,
    > 0.25 action), answered from the warehouse sketches ALONE: a year
    of daily sketches gives day-over-day drift for any column with zero
    raw-data IO, the whole point of keeping mergeable summaries.

    PSI = sum_bins (p_i - q_i) * ln(p_i / q_i), p = current bin share,
    q = reference share, both Laplace-smoothed (cnt + eps over
    total + n_bins*eps) so empty bins are defined. The FULL grid is
    enumerated (groups x sequence(0, n_bins-1)) rather than only
    observed cells: absent bins still carry smoothing mass, and the
    enumeration makes the statistic exactly reproducible by any engine
    — no dependence on which cells happen to exist. Output one row per
    group: (group..., psi), psi rounded to 6 for bi-engine float parity.

    Cost: two ≤ groups x n_bins cell frames joined on the enumerated
    grid — bounded by the grid, never by the data the sketches saw.
    """
    g = list(group_cols)
    grid_bins = F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
    if g:
        groups = ref.select(*g).union(cur.select(*g)).distinct()
        grid = groups.select(*g, grid_bins).withColumn(
            "bin", F.col("bin").cast("int")
        )
    else:
        grid = (
            ref.sparkSession.range(1)
            .select(grid_bins)
            .withColumn("bin", F.col("bin").cast("int"))
        )

    def side(sk: DataFrame, out: str) -> DataFrame:
        tot = sk.groupBy(*g).agg(F.sum("cnt").alias(f"__tot_{out}"))
        cells = sk.select(*g, "bin", F.col("cnt").alias(f"__cnt_{out}"))
        on = [*g, "bin"] if g else ["bin"]
        j = grid.join(cells, on, "left")
        if g:
            j = j.join(tot, g, "left")
        else:
            j = j.crossJoin(F.broadcast(tot))
        return j.select(
            *g,
            "bin",
            (
                (F.coalesce(F.col(f"__cnt_{out}"), F.lit(0)) + F.lit(eps))
                / (F.coalesce(F.col(f"__tot_{out}"), F.lit(0)) + F.lit(n_bins * eps))
            ).alias(out),
        )

    on = [*g, "bin"] if g else ["bin"]
    both = side(ref, "q").join(side(cur, "p"), on)
    term = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    return both.groupBy(*g).agg(F.round(F.sum(term), 6).alias("psi"))


_PSI_EPS = 0.5


@register(
    "q_drift_psi",
    oracle=f"""
        WITH ref_cells AS (
            SELECT o_orderstatus,
                   CAST(LEAST(GREATEST(floor((o_totalprice - {_LO}) / {_WIDTH}), 0),
                              {_BINS - 1}) AS INT) AS bin,
                   count(*) AS cnt
            FROM orders
            WHERE o_totalprice IS NOT NULL AND o_orderdate < DATE '1995-01-01'
            GROUP BY 1, 2
        ), cur_cells AS (
            SELECT o_orderstatus,
                   CAST(LEAST(GREATEST(floor((o_totalprice - {_LO}) / {_WIDTH}), 0),
                              {_BINS - 1}) AS INT) AS bin,
                   count(*) AS cnt
            FROM orders
            WHERE o_totalprice IS NOT NULL AND o_orderdate >= DATE '1995-01-01'
            GROUP BY 1, 2
        ), groups AS (
            SELECT DISTINCT o_orderstatus FROM (
                SELECT o_orderstatus FROM ref_cells
                UNION ALL SELECT o_orderstatus FROM cur_cells
            )
        ), grid AS (
            SELECT g.o_orderstatus, CAST(b.range AS INT) AS bin
            FROM groups g CROSS JOIN range({_BINS}) b
        ), tot AS (
            SELECT r.o_orderstatus,
                   (SELECT COALESCE(sum(cnt), 0) FROM ref_cells rc
                    WHERE rc.o_orderstatus = r.o_orderstatus) AS tot_q,
                   (SELECT COALESCE(sum(cnt), 0) FROM cur_cells cc
                    WHERE cc.o_orderstatus = r.o_orderstatus) AS tot_p
            FROM groups r
        ), shares AS (
            SELECT grid.o_orderstatus, grid.bin,
                   (COALESCE(rc.cnt, 0) + {_PSI_EPS})
                       / (t.tot_q + {_BINS * _PSI_EPS}) AS q,
                   (COALESCE(cc.cnt, 0) + {_PSI_EPS})
                       / (t.tot_p + {_BINS * _PSI_EPS}) AS p
            FROM grid
            LEFT JOIN ref_cells rc USING (o_orderstatus, bin)
            LEFT JOIN cur_cells cc USING (o_orderstatus, bin)
            JOIN tot t USING (o_orderstatus)
        )
        SELECT o_orderstatus, round(sum((p - q) * ln(p / q)), 6) AS psi
        FROM shares GROUP BY o_orderstatus
    """,
    doc="Distribution-DRIFT monitor from the sketch warehouse alone "
    "(the PSI statistic every feature-monitoring stack reports): order "
    "totals before 1995 (reference) vs 1995+ (current) sketched "
    "per status on the shared fixed grid, PSI computed over the FULLY "
    "ENUMERATED grid with Laplace smoothing — absent bins carry "
    "smoothing mass, so the statistic is engine-reproducible and the "
    "driver hash-proves it. Cost bounded by groups x bins cells, zero "
    "raw-data IO beyond the two sketch builds; in production the "
    "sketches are yesterday's stored summaries.",
    tags=("E1", "E2", "stats", "llm-pipeline", "sketch"),
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    ref = quantile_sketch(
        orders.filter(F.col("o_orderdate") < "1995-01-01"),
        "o_totalprice", _LO, _HI, _BINS, group_cols=("o_orderstatus",),
    )
    cur = quantile_sketch(
        orders.filter(F.col("o_orderdate") >= "1995-01-01"),
        "o_totalprice", _LO, _HI, _BINS, group_cols=("o_orderstatus",),
    )
    return sketch_drift_psi(
        ref, cur, _BINS, group_cols=("o_orderstatus",), eps=_PSI_EPS
    )
