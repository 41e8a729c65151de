"""As-of (point-in-time) join — E8 (SURVEY.md §2B).

Spark has no native ASOF JOIN; the naive formulation (non-equi join on
``ts >= p_ts`` + keep-latest) explodes to O(events × matches) pairs before
pruning, which is fatal at scale. We instead use the union-merge technique:
tag both streams, union them, and carry the latest right-side row forward
with a ``last(..., ignorenulls=True)`` running window per key. Cost: one
shuffle on the key + one sort — the same cost class as a single window
function, independent of match fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before
    (``direction='backward'``, default: latest ``right.ts <= left.ts``)
    or at-or-after (``direction='forward'``: earliest ``right.ts >=
    left.ts``) with the same ``on`` key — both inclusive.

    Scales as one shuffle on ``on`` + per-partition sort; no pairwise
    blow-up. Forward is the same union-merge with the traversal
    reversed (descending timestamps), so the carried value is the
    smallest right timestamp at or after each left row. Right-side ties
    on (key, ts) are partition-order-dependent unless ``right_tiebreak``
    names a right column: then one tiebreak winner is picked
    deterministically on every run (ADVICE r1 — required whenever right
    timestamps are not unique per key).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rcols = list(right_cols)
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).alias("__tb"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}")
            for c in left.columns
            if c != on
        ],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None)
        .cast(dict(right.dtypes)[right_tiebreak] if right_tiebreak else "int")
        .alias("__tb"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in rcols],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c != on],
    )
    ts_order = (
        F.asc("__ts") if direction == "backward" else F.desc("__ts")
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, "__side", F.asc_nulls_first("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        "*", *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}") for c in rcols]
    )
    out = carried.filter(F.col("__side") == 1).select(
        F.col(on),
        *[F.col(f"__l_{c}").alias(c) for c in left.columns if c != on],
        *[F.col(f"__m_{c}").alias(f"{c}_matched") for c in rcols],
    )
    return out


@register(
    "q_asof_join",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               p.event_id AS purchase_event_id, p.ts AS purchase_ts
        FROM events e
        ASOF LEFT JOIN (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    doc="E8: as-of join — each event matched to the latest 'purchase' by "
    "the same user at or before its timestamp. Implemented via the "
    "union-merge pattern (no pairwise explosion); the DuckDB oracle uses "
    "its native ASOF LEFT JOIN, which has identical inclusive semantics.",
    tags=("E8",),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    left = ev.select("user_id", "ts", "event_id")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(left, right, on="user_id", right_cols=("event_id", "ts"))
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_matched").alias("purchase_event_id"),
        F.col("ts_matched").alias("purchase_ts"),
    )


@register(
    "q_asof_forward",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               p.event_id AS next_purchase_event_id, p.ts AS next_purchase_ts
        FROM events e
        ASOF LEFT JOIN (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
    doc="E8: forward as-of join — each event matched to the EARLIEST "
    "'purchase' by the same user at or after its timestamp (time-to-"
    "conversion shape). Same union-merge cost class as the backward "
    "variant: one shuffle + one sort, traversed in descending time; "
    "the DuckDB oracle is native forward ASOF (ts <= p.ts).",
    tags=("E8",),
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    left = ev.select("user_id", "ts", "event_id")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        left, right, on="user_id", right_cols=("event_id", "ts"),
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_matched").alias("next_purchase_event_id"),
        F.col("ts_matched").alias("next_purchase_ts"),
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_day: str,
    right_start_day: str,
    span_days: int,
) -> DataFrame:
    """Band/range join — every (left, right) pair with
    ``left_day`` in [right_start_day, right_start_day + span_days - 1]
    (integer day columns) — WITHOUT the cartesian product Catalyst
    falls back to for pure inequality predicates
    (BroadcastNestedLoopJoin: O(|L|·|R|) comparisons, a non-starter at
    100 TB).

    The grid/binning strategy every streaming/DB engine uses for band
    joins (Flink interval join, DuckDB IEJoin's blocking analogue):
    pick a cell width >= the band width, so each right-side interval
    overlaps AT MOST TWO grid cells. The right side explodes into <= 2
    (cell, row) copies, the left side computes its single cell
    scan-side, and the band join becomes one hash EQUI-join on the
    cell plus an exact residual filter. Shuffle volume is |L| + 2|R|
    rows keyed by cell — never a pairwise blowup — and each matching
    pair is produced exactly once (a left row lives in one cell, and
    the right interval's two exploded cells are distinct).

    Columns must be integer "days since epoch" (or any integer axis);
    both sides keep all their other columns."""
    if span_days < 1:
        raise ValueError(f"span_days must be >= 1, got {span_days}")
    w = span_days  # cell width = band width: <= 2 cells per interval
    lcell = left.withColumn("__cell", F.floor(F.col(left_day) / w))
    rcell = right.withColumn(
        "__cell",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.col(right_start_day) / w),
                    F.floor((F.col(right_start_day) + (span_days - 1)) / w),
                )
            )
        ),
    )
    resid = (F.col(left_day) >= F.col(right_start_day)) & (
        F.col(left_day) <= F.col(right_start_day) + (span_days - 1)
    )
    return lcell.join(rcell, "__cell").filter(resid).drop("__cell")


@register(
    "q_range_join_binned",
    oracle="""
        WITH l AS (
            SELECT l_quantity,
                   date_diff('day', DATE '1970-01-01',
                             CAST(l_shipdate AS DATE)) AS ld
            FROM lineitem
        ), o AS (
            SELECT o_orderpriority,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS od
            FROM orders
        )
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(sum(l_quantity), 2) AS sum_qty
        FROM l JOIN o ON l.ld >= o.od AND l.ld <= o.od + 6
        GROUP BY o_orderpriority
    """,
    doc="E8+: band/range join — every (lineitem, order) pair where the "
    "ship date falls in the order date's 7-day window, with NO key "
    "equality to save the join (the shape Catalyst can only cartesian). "
    "Grid-binned: cell width = band width, right intervals explode "
    "into <=2 cells, one hash equi-join on the cell + exact residual "
    "filter — shuffle is |L| + 2|R| rows, never |L|x|R|. Aggregated "
    "per order priority (~2.6M matched pairs reduced map-side). "
    "Hash-proven: DuckDB evaluates the same band predicate natively "
    "(IEJoin) and must produce identical pair counts and quantity "
    "sums.",
    tags=("E8", "E7"),
)
def q_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate pushdown BELOW the range join: the final aggregate only
    # needs per-day lineitem (count, quantity-sum), so the fact side
    # collapses to ~one row per distinct ship day BEFORE pairing —
    # orders × matched-days (<= 7 per order) rows flow through the join
    # instead of orders × matched-lineitems (~262M pairs at sf0.1,
    # measured 46 s without the pushdown; the pairwise surface stays
    # available through range_join_binned itself). The oracle keeps the
    # pairwise formulation — same counts and sums by distributivity.
    epoch = F.to_date(F.lit("1970-01-01"))
    li_day = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_quantity",
            F.datediff(F.to_date("l_shipdate"), epoch).alias("ld"),
        )
        .groupBy("ld")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("l_quantity").alias("__qty"),
        )
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), epoch).alias("od"),
    )
    joined = range_join_binned(li_day, orders, "ld", "od", span_days=7)
    return joined.groupBy("o_orderpriority").agg(
        F.sum("__n").alias("n_pairs"),
        F.round(F.sum("__qty"), 2).alias("sum_qty"),
    )


def _step_unit(step: str) -> str:
    """Validate a resample ``step`` and return its date_trunc unit.

    The grid ORIGIN is ``date_trunc(unit, min ts)``, so only ``'1 <unit>'``
    steps phase the grid the way callers expect: ``'30 minutes'`` would
    silently truncate the origin to the minute while stepping by 30, and
    shorthand like ``'1h'`` used to IndexError. Fail loud instead.
    """
    import re

    m = re.fullmatch(r"\s*(\d+)\s+([a-zA-Z]+?)s?\s*", step)
    if not m:
        raise ValueError(
            f"resample step must look like '1 hour' / '1 day', got {step!r}"
            " (shorthand like '1h' is not supported)"
        )
    n, unit = int(m.group(1)), m.group(2).lower()
    if n != 1:
        raise ValueError(
            f"resample step count must be 1 (got {step!r}): the grid origin"
            f" is date_trunc('{unit}', min ts), so a multi-{unit} step would"
            " produce a differently-phased grid — resample at"
            f" '1 {unit}' and aggregate, or pass the coarser unit"
        )
    if unit not in {
        "second", "minute", "hour", "day", "week", "month", "quarter", "year",
    }:
        raise ValueError(f"unsupported resample unit {unit!r} in {step!r}")
    return unit


def resample_ffill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tiebreak: str | None = None,
) -> DataFrame:
    """Regular-grid resampling with forward-fill (the pandas
    ``resample().ffill()`` shape, Spark-native): per key, a grid of
    ``step``-spaced points spanning [trunc(min ts), trunc(max ts)], each
    carrying the latest observation at or before it.

    The gap this fills: event streams are irregular, every downstream
    consumer (feature windows, dashboards, rate comparisons) wants a
    regular grid. Cost: one (key)-grouped min/max aggregate, a
    sequence+explode whose output IS the grid (no cross join against a
    calendar table), and one as-of join — the union-merge machinery
    above, one shuffle + one sort, no pairwise blow-up. Grid density is
    the caller's contract: points per key = span/step.
    """
    unit = _step_unit(step)
    spans = df.groupBy(key).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("__a"),
        F.date_trunc(unit, F.max(ts_col)).alias("__z"),
    )
    grid = spans.select(
        key,
        F.explode(
            F.expr(f"sequence(__a, __z, interval {step})")
        ).alias("grid_ts"),
    )
    obs = df.select(
        key,
        F.col(ts_col),
        F.col(value_col),
        *( [F.col(tiebreak)] if tiebreak and tiebreak not in (key, ts_col, value_col) else [] ),
    )
    return asof_join(
        grid,
        obs,
        on=key,
        left_ts="grid_ts",
        right_ts=ts_col,
        right_cols=(value_col,),
        right_tiebreak=tiebreak,
    ).select(
        key, "grid_ts", F.col(f"{value_col}_matched").alias(value_col)
    )


@register(
    "q_resample_ffill",
    oracle="""
        WITH b AS (
            SELECT user_id,
                   date_trunc('hour', min(ts)) AS a,
                   date_trunc('hour', max(ts)) AS z
            FROM events GROUP BY user_id
        ), grid AS (
            SELECT user_id, unnest(generate_series(a, z, INTERVAL 1 HOUR)) AS grid_ts
            FROM b
        )
        SELECT g.user_id, g.grid_ts,
               (SELECT e.value FROM events e
                WHERE e.user_id = g.user_id AND e.ts <= g.grid_ts
                ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS value
        FROM grid g
    """,
    doc="Regular-grid resampling with forward-fill (pandas resample "
    "parity, Spark-native): hourly grid per user spanning its event "
    "range, each point carrying the latest value at or before it "
    "(event_id max-tiebreak at equal timestamps — the as-of carry "
    "rule). One grouped min/max + sequence explode + one union-merge "
    "as-of join; the oracle's correlated latest-observation subquery "
    "decorrelates in DuckDB.",
    tags=("E8", "E13", "analytics"),
)
def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return resample_ffill(
        ev, key="user_id", ts_col="ts", value_col="value", tiebreak="event_id"
    )


def resample_interp(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    tiebreak: str | None = None,
) -> DataFrame:
    """Regular-grid resampling with LINEAR interpolation (the pandas
    ``resample().interpolate()`` shape): per key, each ``step``-spaced
    grid point carries prev + (next - prev) * (t - t_prev) / (t_next -
    t_prev) between its neighboring observations.

    Edge contract (deterministic on any engine): before the first
    observation -> NULL; after the last -> hold the previous value
    (ffill); an observation exactly on the grid point appears in BOTH
    as-of directions, making the fraction 0/valid either way. Two
    union-merge as-of joins (backward + forward) over the same grid —
    still one shuffle class, no pairwise blow-up. interp rounded 6dp
    (both engines compute the identical double expression).
    """
    unit = _step_unit(step)
    spans = df.groupBy(key).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("__a"),
        F.date_trunc(unit, F.max(ts_col)).alias("__z"),
    )
    grid = spans.select(
        key,
        F.explode(F.expr(f"sequence(__a, __z, interval {step})")).alias(
            "grid_ts"
        ),
    )
    obs = df.select(
        key,
        F.col(ts_col),
        F.col(value_col),
        *([F.col(tiebreak)] if tiebreak else []),
    )
    back = asof_join(
        grid, obs, on=key, left_ts="grid_ts", right_ts=ts_col,
        right_cols=(value_col, ts_col), right_tiebreak=tiebreak,
    ).withColumnsRenamed(
        {f"{value_col}_matched": "__pv", f"{ts_col}_matched": "__pt"}
    )
    fwd = asof_join(
        grid, obs, on=key, left_ts="grid_ts", right_ts=ts_col,
        right_cols=(value_col, ts_col), right_tiebreak=tiebreak,
        direction="forward",
    ).withColumnsRenamed(
        {f"{value_col}_matched": "__nv", f"{ts_col}_matched": "__nt"}
    )
    both = back.join(fwd, [key, "grid_ts"])
    def _secs(c):
        # TIMESTAMP_NTZ refuses a direct double cast (Spark 4) — route
        # through TIMESTAMP (session tz is UTC everywhere in this repo)
        return c.cast("timestamp").cast("double")

    g = _secs(F.col("grid_ts"))
    pt, nt = _secs(F.col("__pt")), _secs(F.col("__nt"))
    frac = (g - pt) / (nt - pt)
    interp = F.when(F.col("__pv").isNull(), F.lit(None)).when(
        F.col("__nv").isNull() | (nt == pt), F.col("__pv")
    ).otherwise(F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac)
    return both.select(
        key, "grid_ts", F.round(interp, 6).alias(value_col)
    )


@register(
    "q_resample_interp",
    oracle="""
        WITH b AS (
            SELECT user_id,
                   date_trunc('hour', min(ts)) AS a,
                   date_trunc('hour', max(ts)) AS z
            FROM events GROUP BY user_id
        ), grid AS (
            SELECT user_id, unnest(generate_series(a, z, INTERVAL 1 HOUR)) AS grid_ts
            FROM b
        ), nb AS (
            SELECT g.user_id, g.grid_ts,
                   (SELECT e.value FROM events e
                    WHERE e.user_id = g.user_id AND e.ts <= g.grid_ts
                    ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS pv,
                   (SELECT epoch(e.ts) FROM events e
                    WHERE e.user_id = g.user_id AND e.ts <= g.grid_ts
                    ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS pt,
                   (SELECT e.value FROM events e
                    WHERE e.user_id = g.user_id AND e.ts >= g.grid_ts
                    ORDER BY e.ts ASC, e.event_id DESC LIMIT 1) AS nv,
                   (SELECT epoch(e.ts) FROM events e
                    WHERE e.user_id = g.user_id AND e.ts >= g.grid_ts
                    ORDER BY e.ts ASC, e.event_id DESC LIMIT 1) AS nt
            FROM grid g
        )
        SELECT user_id, grid_ts,
               round(CASE WHEN pv IS NULL THEN NULL
                          WHEN nv IS NULL OR nt = pt THEN pv
                          ELSE pv + (nv - pv)
                               * (epoch(grid_ts) - pt) / (nt - pt)
                     END, 6) AS value
        FROM nb
    """,
    doc="Regular-grid resampling with linear interpolation (pandas "
    "interpolate parity): each hourly point blends its neighboring "
    "observations by time fraction — two union-merge as-of joins "
    "(backward + forward) over one grid, matching tie rules both "
    "directions (max event_id at the boundary timestamp). NULL before "
    "the first observation, hold-last after the final one.",
    tags=("E8", "E13", "analytics"),
)
def q_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return resample_interp(
        ev, key="user_id", ts_col="ts", value_col="value", tiebreak="event_id"
    )


def derive_interval_cell(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    q: float = 0.9,
) -> int:
    """Derive a grid cell width for :func:`interval_join_binned` from the
    data: the ``q``-quantile of interval lengths across BOTH sides (one
    tiny approx aggregate, driver state = one float). With cell ≈ the
    typical interval length, a typical interval explodes into ≤ 2 cells
    — the ~2x row blow-up the operator is designed around — instead of
    the silent k+1-row blow-up a caller gets from guessing ``cell`` far
    below the real lengths (ADVICE r13)."""
    lens = left.select(
        (F.col(l_end) - F.col(l_start)).cast("double").alias("__len")
    ).unionAll(
        right.select(
            (F.col(r_end) - F.col(r_start)).cast("double").alias("__len")
        )
    )
    p = lens.approxQuantile("__len", [q], 0.01)
    return max(1, int(p[0]) + 1) if p else 1


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    cell: int | None,
    max_cells_per_interval: int = 64,
) -> DataFrame:
    """Interval OVERLAP join (closed intervals: ``l_start <= r_end AND
    r_start <= l_end``) without a cartesian plan — the interval×interval
    generalization of :func:`range_join_binned`'s point-in-band shape.

    Both sides explode onto a fixed grid of ``cell``-width cells (an
    interval covers ``len/cell + 1`` cells — pick ``cell`` near the
    typical interval length so the blow-up is ~2x rows, or pass
    ``cell=None`` to derive it from the p90 interval length via
    :func:`derive_interval_cell`); pairs meet via ONE hash equi-join on
    the cell id. A pair overlapping several cells would be emitted once
    per shared cell, so each pair is claimed by exactly one cell — the
    one containing ``greatest(l_start, r_start)`` (both intervals
    provably cover it) — which makes the output duplicate-free with NO
    post-join dedup shuffle.

    The explosion is CAPPED, not contract-only (the in_cap_groups /
    fail_on_drops discipline): any single interval that would explode
    into more than ``max_cells_per_interval`` grid rows fails the job
    loudly with the offending cell count — a mis-sized ``cell`` surfaces
    as a diagnosable error, never as a silent row blow-up.

    Shuffle cost: sum of exploded cell rows, never |L|x|R|. Catalyst
    alone can only plan the overlap predicate as a nested-loop cartesian
    — the 100 TB cliff this operator exists to avoid.
    """
    if cell is None:
        cell = derive_interval_cell(
            left, right, l_start, l_end, r_start, r_end
        )
    if cell < 1:
        raise ValueError(f"cell width must be >= 1, got {cell}")
    if max_cells_per_interval < 2:
        raise ValueError(
            f"max_cells_per_interval must be >= 2, got {max_cells_per_interval}"
        )

    def cells(s: str, e: str) -> F.Column:
        lo = F.floor(F.col(s) / cell).cast("long")
        hi = F.floor(F.col(e) / cell).cast("long")
        n = hi - lo + 1
        # the guard lives INSIDE the sequence bound so Catalyst cannot
        # prune it away with an unused assert column
        hi_guarded = F.when(n <= max_cells_per_interval, hi).otherwise(
            F.raise_error(
                F.format_string(
                    "interval [%s] explodes into %d grid cells at cell "
                    f"width {cell} (cap {max_cells_per_interval}): raise "
                    "`cell` (or pass cell=None to derive it from the p90 "
                    "interval length), or raise max_cells_per_interval "
                    "deliberately",
                    F.concat_ws(
                        ", ", F.col(s).cast("string"), F.col(e).cast("string")
                    ),
                    n,
                )
            )
        )
        return F.explode(F.sequence(lo, hi_guarded))

    lcell = left.withColumn("__cell", cells(l_start, l_end))
    rcell = right.withColumn("__cell", cells(r_start, r_end))
    overlap = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    claimed = (
        F.floor(F.greatest(F.col(l_start), F.col(r_start)) / cell).cast("long")
        == F.col("__cell")
    )
    return lcell.join(rcell, "__cell").filter(overlap & claimed).drop("__cell")


@register(
    "q_interval_join",
    oracle="""
        WITH l AS (
            SELECT ld AS ls, ld + 2 AS le, n, qty FROM (
                SELECT date_diff('day', DATE '1970-01-01',
                                 CAST(l_shipdate AS DATE)) AS ld,
                       count(*) AS n,
                       sum(l_quantity) AS qty
                FROM lineitem GROUP BY 1
            )
        ), o AS (
            SELECT o_orderpriority,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS os,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) + 3 AS oe
            FROM orders
        )
        SELECT o_orderpriority,
               CAST(sum(n) AS BIGINT) AS n_pairs,
               round(sum(qty), 2) AS sum_qty
        FROM l JOIN o ON l.ls <= o.oe AND o.os <= l.le
        GROUP BY o_orderpriority
    """,
    doc="E8+: interval OVERLAP join — every (ship-window, order-window) "
    "pair whose closed day intervals intersect ([ship, ship+2] vs "
    "[order, order+3]), no key equality anywhere. Grid-binned with "
    "exactly-once pair emission (each pair claimed by the cell holding "
    "greatest(starts)) — one hash equi-join on the cell, shuffle linear "
    "in exploded rows, never |L|x|R|; the fact side is pre-aggregated "
    "per ship day below the join (the q_range_join_binned pushdown). "
    "Hash-proven against DuckDB's native IEJoin evaluation of the same "
    "overlap predicate.",
    tags=("E8", "E7"),
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch = F.to_date(F.lit("1970-01-01"))
    li = (
        table(spark, sf_dir, "lineitem")
        .select(
            "l_quantity",
            F.datediff(F.to_date("l_shipdate"), epoch).alias("ld"),
        )
        .groupBy("ld")
        .agg(F.count(F.lit(1)).alias("__n"), F.sum("l_quantity").alias("__qty"))
        .select(
            F.col("ld").alias("ls"),
            (F.col("ld") + 2).alias("le"),
            "__n",
            "__qty",
        )
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), epoch).alias("os"),
        (F.datediff(F.to_date("o_orderdate"), epoch) + 3).alias("oe"),
    )
    joined = interval_join_binned(li, orders, "ls", "le", "os", "oe", cell=4)
    return joined.groupBy("o_orderpriority").agg(
        F.sum("__n").alias("n_pairs"),
        F.round(F.sum("__qty"), 2).alias("sum_qty"),
    )
