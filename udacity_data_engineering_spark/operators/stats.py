"""Statistical aggregates + remaining window-function matrix + reshape
ops (unpivot, ordered string agg, histogram bucketing).

All pure Catalyst expressions with DuckDB oracles; FP results rounded on
both sides (engine summation orders differ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table


@register(
    "q_stats_agg",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 6) AS sd_qty,
               round(var_samp(l_quantity), 6) AS var_qty,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               round(skewness(l_quantity), 6) AS skew_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    doc="Statistical aggregates: stddev/variance/correlation/covariance/"
    "skewness — single-pass decomposable moments, partial+final like any "
    "hash aggregate. Spark's skewness is the population g1; DuckDB's is "
    "the bias-corrected G1 = g1*sqrt(n(n-1))/(n-2) — the Spark side "
    "applies the correction so both report G1.",
    tags=("E1", "stats"),
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.round(
            F.skewness("l_quantity")
            * F.sqrt(F.count(F.lit(1)) * (F.count(F.lit(1)) - 1))
            / (F.count(F.lit(1)) - 2),
            6,
        ).alias("skew_qty"),
    )


@register(
    "q_window_navigation",
    oracle="""
        SELECT o_orderkey, o_custkey,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_order,
               nth_value(o_orderkey, 2) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS second_order,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Window navigation/distribution matrix: first/last/nth_value "
    "(full-partition frames so last/nth are well-defined), ntile, "
    "percent_rank, cume_dist.",
    tags=("E5",),
)
def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_order"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "q_unpivot",
    oracle="""
        SELECT c_custkey, metric, round(val, 2) AS val
        FROM (
            UNPIVOT (SELECT c_custkey, c_acctbal,
                            CAST(c_nationkey AS DOUBLE) AS c_nationkey
                     FROM customer)
            ON c_acctbal, c_nationkey
            INTO NAME metric VALUE val)
    """,
    doc="Unpivot/melt: wide numeric columns to (key, metric, value) "
    "rows — the inverse of q_pivot. Spark unpivot == SQL UNPIVOT.",
    tags=("sql-surface",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.col("c_nationkey").cast("double").alias("c_nationkey")
    )
    return c.unpivot(
        "c_custkey", ["c_acctbal", "c_nationkey"], "metric", "val"
    ).select("c_custkey", "metric", F.round("val", 2).alias("val"))


@register(
    "q_string_agg",
    oracle="""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey
    """,
    doc="Ordered string aggregation: collect + sort + join == "
    "string_agg(... ORDER BY). The explicit sort makes the result "
    "deterministic — unordered listagg is engine-arbitrary.",
    tags=("E1", "sql-surface"),
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "q_histogram",
    oracle="""
        SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                         WHEN o_totalprice >= 600000 THEN 13
                         ELSE floor(o_totalprice / 50000) + 1 END AS INT)
                   AS bucket,
               count(*) AS n
        FROM orders GROUP BY 1
    """,
    doc="Histogram via width_bucket: fixed-range bucketing + count — "
    "the single-pass distribution sketch. DuckDB 1.0 lacks "
    "width_bucket, so the oracle spells out the same formula "
    "(floor((v-lo)/w)+1 with under/overflow buckets 0 and n+1).",
    tags=("E1", "stats"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy(
        F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12))
        .cast("int")
        .alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))


def robust_outliers(
    df: DataFrame,
    value: str,
    group: str | None = None,
    cutoff: float = 3.5,
) -> DataFrame:
    """Modified z-score outlier flagging (Iglewicz & Hoaglin 1993):
    z = 0.6745 * (x - median) / MAD, flag |z| > cutoff.

    Median/MAD instead of mean/stddev because corpus length and score
    distributions are heavy-tailed — a single 100 MB document drags a
    mean-based filter's threshold, not a median-based one. Optionally
    grouped (e.g. per language, the CCNet posture: length norms differ
    per language).

    Scale shape: two EXACT percentile aggregates (one for the median,
    one for the MAD over |x - median|), each a per-group sort-based agg
    whose output is |groups| rows, broadcast back — never a global
    window. MAD == 0 (a majority-constant group) yields NULL z and
    is_outlier = false: a degenerate group has no robust scale, and
    flagging everything off a zero denominator is the bug this guard
    prevents.
    """
    g = [group] if group else []
    med = F.broadcast(
        df.groupBy(*g).agg(F.expr(f"percentile({value}, 0.5)").alias("__med"))
    )
    with_med = df.join(med, g) if group else df.crossJoin(med)
    mad = with_med.groupBy(*g).agg(
        F.expr(f"percentile(abs({value} - __med), 0.5)").alias("__mad")
    )
    joined = (
        with_med.join(F.broadcast(mad), g)
        if group
        else with_med.crossJoin(F.broadcast(mad))
    )
    # Rounding contract (round 10): round the PURE ratio first, THEN
    # scale by 0.6745. Rounding 0.6745*ratio directly hits cross-engine
    # half-up-vs-binary-round divergence systematically, because the
    # 4-decimal constant times a short exact ratio lands EXACTLY on
    # 6dp boundaries (sf0.1 zh: 1.0286125 -> Spark 1.028613 / DuckDB
    # 1.028612). The ratio's own boundary cases have power-of-two
    # denominators (quantile interpolation halves) = exact doubles,
    # where both engines agree; the final 10dp round is an identity on
    # the <=10-decimal product, pinning both engines to the nearest
    # double of the same decimal.
    ratio = F.round(
        (F.col(value) - F.col("__med"))
        / F.nullif(F.col("__mad"), F.lit(0.0)),
        6,
    )
    z = F.round(ratio * F.lit(0.6745), 10)
    return (
        joined.withColumn("robust_z", z)
        .withColumn(
            "is_outlier",
            F.coalesce(F.abs(F.col("robust_z")) > cutoff, F.lit(False)),
        )
        .drop("__med", "__mad")
    )


@register(
    "q_robust_outliers",
    oracle="""
        WITH med AS (
            SELECT lang, quantile_cont(n_chars, 0.5) AS m
            FROM documents GROUP BY lang
        ), mad AS (
            SELECT d.lang, quantile_cont(abs(d.n_chars - med.m), 0.5) AS s
            FROM documents d JOIN med USING (lang)
            GROUP BY d.lang
        )
        SELECT doc_id, d.lang,
               round(round((n_chars - m) / nullif(s, 0.0), 6)
                     * 0.6745, 10) AS robust_z,
               coalesce(abs(round(round((n_chars - m) / nullif(s, 0.0), 6)
                                  * 0.6745, 10)) > 3.5,
                        false) AS is_outlier
        FROM documents d
        JOIN med USING (lang) JOIN mad ON mad.lang = d.lang
    """,
    doc="Per-language modified z-score (median/MAD) length outliers — "
    "the heavy-tail-safe alternative to mean/stddev filters. Two exact "
    "per-group percentile aggregates broadcast back; no global window. "
    "Spark percentile() == DuckDB quantile_cont (both linear "
    "interpolation).",
    tags=("E10", "stats", "quality", "llm-pipeline"),
)
def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return robust_outliers(docs, "n_chars", group="lang").select(
        "doc_id", "lang", "robust_z", "is_outlier"
    )


def chi_square_independence(
    df: DataFrame, a: str, b: str
) -> DataFrame:
    """Per-cell chi-square contributions for the independence test of
    two categorical columns: expected = row_total * col_total / n,
    contrib = (observed - expected)^2 / expected. The corpus-composition
    diagnostic (is language independent of source? a skewed cell =
    a collection-pipeline artifact worth investigating).

    Three wordcount-shaped aggregates (cells, row totals, col totals) +
    broadcast joins — shuffle is category-cardinality-sized. Sum the
    contrib column for the chi-square statistic; dof = (R-1)(C-1).
    """
    cells = df.groupBy(a, b).agg(F.count(F.lit(1)).alias("observed"))
    rows_t = cells.groupBy(a).agg(F.sum("observed").alias("__r"))
    cols_t = cells.groupBy(b).agg(F.sum("observed").alias("__c"))
    n = cells.agg(F.sum("observed").alias("__n"))
    e = F.col("__r") * F.col("__c") / F.col("__n")
    contrib = (F.col("observed") - e) * (F.col("observed") - e) / e
    return (
        cells.join(F.broadcast(rows_t), a)
        .join(F.broadcast(cols_t), b)
        .crossJoin(F.broadcast(n))
        .select(
            a,
            b,
            "observed",
            F.round(e, 6).alias("expected"),
            F.round(contrib, 6).alias("contrib"),
        )
    )


@register(
    "q_chisq_lang_source",
    oracle="""
        WITH cells AS (
            SELECT lang, source, count(*) AS observed
            FROM documents GROUP BY lang, source
        ), r AS (SELECT lang, sum(observed) AS rt FROM cells GROUP BY lang),
        c AS (SELECT source, sum(observed) AS ct FROM cells GROUP BY source),
        n AS (SELECT sum(observed) AS nt FROM cells)
        SELECT cells.lang, cells.source, CAST(observed AS BIGINT) AS observed,
               round(rt * ct / CAST(nt AS DOUBLE), 6) AS expected,
               round((observed - rt * ct / CAST(nt AS DOUBLE))
                     * (observed - rt * ct / CAST(nt AS DOUBLE))
                     / (rt * ct / CAST(nt AS DOUBLE)), 6) AS contrib
        FROM cells JOIN r USING (lang) JOIN c USING (source)
        CROSS JOIN n
    """,
    doc="Chi-square independence cells for lang x source — the corpus "
    "composition diagnostic (a skewed cell = a collection artifact). "
    "Category-cardinality-sized aggregates + broadcast joins; sum "
    "contrib for the statistic.",
    tags=("E1", "stats", "quality", "llm-pipeline"),
)
def q_chisq_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return chi_square_independence(docs, "lang", "source")


def seasonal_anomaly(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group: str,
    cutoff: float = 3.0,
) -> DataFrame:
    """Seasonal-baseline anomaly scoring: z of each observation against
    the mean/stddev of ITS OWN (group, day-of-week, hour-of-day) slot —
    "is this value unusual for Tuesday 9am?", the time-of-week
    seasonality every ops/metrics monitor needs (a 3am traffic level
    that is normal at 3am but pathological at noon).

    One slot-keyed aggregate (|groups| x 168 rows) broadcast back; z is
    rounded to 4dp and the flag computed FROM the rounded z on both
    engines, so a boundary observation can never flag-flip between
    engines. Slots with stddev 0 yield NULL z / no flag.
    """
    slot = [group, F.dayofweek(ts_col).alias("__dow"), F.hour(ts_col).alias("__hr")]
    stats = (
        df.select(*slot, F.col(value_col))
        .groupBy(group, "__dow", "__hr")
        .agg(
            F.avg(value_col).alias("__mu"),
            F.stddev_samp(value_col).alias("__sd"),
        )
    )
    with_slot = df.select(
        "*", F.dayofweek(ts_col).alias("__dow"), F.hour(ts_col).alias("__hr")
    )
    joined = with_slot.join(F.broadcast(stats), [group, "__dow", "__hr"])
    z = F.round(
        (F.col(value_col) - F.col("__mu")) / F.nullif(F.col("__sd"), F.lit(0.0)),
        4,
    )
    return (
        joined.withColumn("season_z", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("season_z")) > cutoff, F.lit(False)),
        )
        .drop("__dow", "__hr", "__mu", "__sd")
    )


@register(
    "q_seasonal_anomaly",
    oracle="""
        WITH slotted AS (
            SELECT event_id, event_type, value,
                   dayofweek(ts) + 1 AS dow, hour(ts) AS hr
            FROM events
        ), s AS (
            SELECT event_type, dow, hr,
                   avg(value) AS mu, stddev_samp(value) AS sd
            FROM slotted GROUP BY event_type, dow, hr
        )
        SELECT e.event_id,
               round((e.value - mu) / nullif(sd, 0.0), 4) AS season_z,
               coalesce(abs(round((e.value - mu) / nullif(sd, 0.0), 4)) > 3.0,
                        false) AS is_anomaly
        FROM slotted e JOIN s USING (event_type, dow, hr)
    """,
    doc="Time-of-week seasonal anomaly: z of each event's value against "
    "its (event_type, day-of-week, hour) slot baseline — normal-at-3am "
    "vs pathological-at-noon. Slot aggregate is |types| x 168 rows "
    "broadcast back; flag computed from the 4dp-rounded z on both "
    "engines (no boundary flag-flips). Spark dayofweek = DuckDB "
    "dayofweek + 1.",
    tags=("E5", "stats", "analytics"),
)
def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return seasonal_anomaly(ev, "ts", "value", group="event_type").select(
        "event_id", "season_z", "is_anomaly"
    )
