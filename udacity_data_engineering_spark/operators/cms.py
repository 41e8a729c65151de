"""Count-min sketch token frequencies — the constant-memory, mergeable
counterpart to the exact heavy-hitters pass (charter LLM-pipeline
extension; the reference has no text surface, SURVEY.md §2B).

heavyhitters.py answers "which tokens exceed 1/k of the corpus" EXACTLY
with a bounded two-pass; a count-min sketch answers point frequency
queries for ANY token with one pass and D x W counters total (here
4 x 1024 = 4096 cells), overestimating only — est >= true always, and
est <= true + eps*N with probability 1-delta for W = ceil(e/eps),
D = ceil(ln 1/delta) (Cormode & Muthukrishnan, J.Algorithms 2005). The
sketch is a sum — cells merge across partitions, batches, days — which is
what a 100 TB streaming deployment actually keeps, not exact counts.

Provability: production CMS uses xxhash-style row hashes; the registered
queries instead derive all D row hashes from the repo's bi-engine
polynomial string hash (text.rolling_hash == the q_rolling_hash oracle's
list_reduce) via fixed affine maps h_j(t) = (a_j*h(t) + b_j mod P) mod W,
so DuckDB recomputes the identical sketch and the driver hash-proves both
the sketch table and the estimates. Swapping the hash family changes no
plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.text import rolling_hash
from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table

#: Mersenne prime M31; affine row-hash constants (any fixed odd-ish pairs
#: work — independence across rows is what matters). These four (a, b)
#: pairs appear verbatim in the oracle SQL below — keep in sync.
CMS_P = 2147483647
CMS_D = 4
CMS_W = 1024
CMS_AB = ((1103515245, 12345), (1540483477, 104729), (214013, 2531011), (69069, 7919))

#: the oracle fragment computing the same D affine row hashes
_AB_VALUES = ", ".join(f"({j}, {a}, {b})" for j, (a, b) in enumerate(CMS_AB))


def _row_cols(h: Column) -> list[Column]:
    """The D cell columns for base hash ``h`` (one per sketch row)."""
    return [
        F.pmod(F.pmod(h * F.lit(a) + F.lit(b), F.lit(CMS_P)), F.lit(CMS_W))
        for a, b in CMS_AB
    ]


def cms_sketch(terms: DataFrame, term_col: str = "term") -> DataFrame:
    """Build the D x W sketch over every row of ``terms`` (duplicates
    count): (row, col, cnt) cells, at most D*W rows regardless of corpus
    size. One scan + one partial-aggregating shuffle of <= D*W groups;
    cells are additive, so per-partition / per-batch sketches merge by
    summing cnt."""
    h = rolling_hash(F.col(term_col))
    return (
        terms.select(F.posexplode(F.array(*_row_cols(h))).alias("row", "col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    queries: DataFrame, sketch: DataFrame, term_col: str = "term"
) -> DataFrame:
    """Point-frequency estimates for each distinct query term: the min
    over the D cells the term hashes to (overestimate-only). The sketch
    is tiny — broadcast — so the probe side never shuffles on the cell."""
    h = rolling_hash(F.col(term_col))
    cells = queries.select(
        term_col, F.posexplode(F.array(*_row_cols(h))).alias("row", "col")
    )
    return (
        cells.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cms_est"))
    )


_TOK = "SELECT unnest(string_split(text, ' ')) AS term FROM documents"
_HASH = """list_reduce(
               list_prepend(
                   CAST(0 AS BIGINT),
                   list_transform(
                       list_filter(string_split(term, ''), c -> c != ''),
                       c -> CAST(unicode(c) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 2147483647)"""


@register(
    "q_cms_sketch",
    oracle=f"""
        WITH tok AS ({_TOK}),
        hashed AS (SELECT {_HASH} AS hv FROM tok),
        cells AS (
            SELECT CAST(p.j AS INT) AS row,
                   ((hv * p.a + p.b) % 2147483647) % 1024 AS col
            FROM hashed
            CROSS JOIN (VALUES {_AB_VALUES}) AS p(j, a, b)
        )
        SELECT row, col, count(*) AS cnt
        FROM cells
        GROUP BY 1, 2
    """,
    doc="Count-min sketch of corpus token frequencies (D=4 rows x W=1024 "
    "cells): one scan, one <=4096-group shuffle, constant output size at "
    "any corpus scale; cells are additive so partition/batch sketches "
    "merge by summing. Row hashes are fixed affine maps over the "
    "bi-engine rolling hash, so DuckDB rebuilds the identical sketch and "
    "the driver hash-proves it.",
    tags=("E10", "E2", "llm-pipeline"),
)
def q_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("term"))
    return cms_sketch(toks)


@register(
    "q_cms_estimates",
    oracle=f"""
        WITH tok AS ({_TOK}),
        exact AS (
            SELECT term, count(*) AS exact_cnt FROM tok GROUP BY term
        ),
        heavy AS (
            SELECT term, exact_cnt FROM exact
            WHERE exact_cnt * 500 >= (SELECT count(*) FROM tok)
        ),
        hashed AS (SELECT term, {_HASH} AS hv FROM tok),
        cells AS (
            SELECT hv, CAST(p.j AS INT) AS row,
                   ((hv * p.a + p.b) % 2147483647) % 1024 AS col
            FROM hashed
            CROSS JOIN (VALUES {_AB_VALUES}) AS p(j, a, b)
        ),
        sketch AS (
            SELECT row, col, count(*) AS cnt FROM cells GROUP BY 1, 2
        ),
        qcells AS (
            SELECT DISTINCT h.term, CAST(p.j AS INT) AS row,
                   ((h.hv * p.a + p.b) % 2147483647) % 1024 AS col
            FROM (SELECT term, {_HASH} AS hv
                  FROM (SELECT DISTINCT term FROM heavy) q) h
            CROSS JOIN (VALUES {_AB_VALUES}) AS p(j, a, b)
        ),
        est AS (
            SELECT q.term, min(coalesce(s.cnt, 0)) AS cms_est
            FROM qcells q LEFT JOIN sketch s USING (row, col)
            GROUP BY q.term
        )
        SELECT h.term, h.exact_cnt, e.cms_est
        FROM heavy h JOIN est e USING (term)
    """,
    doc="CMS point estimates vs exact counts for every token holding "
    ">= 1/500 of the corpus: (term, exact_cnt, cms_est), cms_est >= "
    "exact_cnt always (overestimate-only guarantee, pinned in tests). "
    "The probe explodes each query term to its D cells and broadcast-"
    "joins the 4096-cell sketch — no shuffle on the probe side. Both the "
    "sketch and the estimates are recomputed independently in DuckDB.",
    tags=("E10", "E2", "llm-pipeline"),
)
def q_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("term"))
    sketch = cms_sketch(toks)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    # corpus-total threshold via the 1-row broadcast stats frame (the
    # with_total_count pattern, but the total here is token OCCURRENCES,
    # not exact's row count — plan_audit-allowlisted bounded BNLJ)
    total = toks.agg(F.count(F.lit(1)).alias("__n"))
    heavy = (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("exact_cnt") * 500 >= F.col("__n"))
        .drop("__n")
    )
    est = cms_estimate(heavy.select("term"), sketch)
    return heavy.join(est, "term")
