"""Sampling & corpus mixing — the data-curation operators a pretraining
pipeline runs between dedup and tokenization.

Two kinds, by reproducibility contract:

- **Deterministic hash sampling** (``q_stratified_mix``): membership is a
  pure function of the row key — ``(doc_id * KNUTH) mod 2^32 mod 100``
  compared against a per-stratum rate. Re-running on any cluster layout,
  any partitioning, any engine yields the same rows, which is exactly
  what corpus reproducibility demands (a seeded RNG stream does NOT
  survive repartitioning). Pure integer arithmetic on both engines, so
  it is SQL-oracle-checked, unlike RNG sampling (q_sample, rows-only).
- **Engine RNG sampling** (``sample_fraction``/``stratified_by``):
  Bernoulli `df.sample` / `df.sampleBy` — fine for one-off stats, not
  for reproducible corpus cuts.

At 100 TB the hash filter is a codegen'd scan-side predicate — no
shuffle, no state, prunes before any downstream join or write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_data_engineering_spark.plans.registry import register
from udacity_data_engineering_spark.session import table

#: Knuth's multiplicative-hash constant (2^32 / phi) — public domain
#: arithmetic, identical in any engine with 64-bit integer math.
KNUTH = 2654435761

#: A second, independent multiplier (xxhash's PRIME32_2) for cuts that
#: must compose independently with hash_pct. NOTE: ``hash_pct(key +
#: salt)`` is NOT independent of ``hash_pct(key)`` — the hash is affine,
#: so a salted key yields a deterministic rotation of the same buckets
#: (measured: composing two such cuts gives joint probabilities of 0 or
#: 2x expectation). Two DIFFERENT odd multipliers measure product-
#: independent at every threshold pair (scripts-verified to 4 decimals
#: over 200k keys).
KNUTH2 = 2246822519


def hash_pct2(key: Column) -> Column:
    """Second independent percentile bucket — same overflow-safe fold,
    different multiplier. Use for any sampling decision that must be
    independent of a hash_pct-based cut of the same keys."""
    return (F.pmod(key, F.lit(2147483648)) * F.lit(KNUTH2)) % F.lit(4294967296) % F.lit(100)


def hash_pct(key: Column) -> Column:
    """Deterministic per-row percentile bucket in [0, 100).

    The key is folded into [0, 2^31) BEFORE the Knuth multiply so the
    product stays below 2^62 — no int64 overflow for any key (overflow
    errors under Spark ANSI mode and silently diverges from DuckDB's
    hugeint promotion). Non-negative keys hash identically on every
    engine with 64-bit integer math.
    """
    return (F.pmod(key, F.lit(2147483648)) * F.lit(KNUTH)) % F.lit(4294967296) % F.lit(100)


def deterministic_sample(df: DataFrame, key: str, pct: int) -> DataFrame:
    """Keep ~pct% of rows, chosen by key hash — reproducible anywhere."""
    return df.filter(hash_pct(F.col(key)) < pct)


def sample_fraction(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(fraction=fraction, seed=seed)


def stratified_by(
    df: DataFrame, col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    return df.sampleBy(col, fractions=fractions, seed=seed)


@register(
    "q_stratified_mix",
    oracle="""
        SELECT doc_id, lang, source
        FROM documents
        WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 <
              CASE lang WHEN 'en' THEN 60 WHEN 'de' THEN 30 ELSE 10 END
    """,
    doc="Deterministic corpus mixing: per-language sampling rates "
    "(en 60%, de 30%, rest 10%) via a Knuth multiplicative hash of the "
    "row key — the reproducible down-sampling a pretraining data mix "
    "uses. Pure integer arithmetic == same survivors on every engine, "
    "every partitioning; the filter is a scan-side predicate, no "
    "shuffle. RNG sampleBy (q_sample) cannot make this guarantee.",
    tags=("sampling", "E10", "dedup"),
)
def q_stratified_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 60)
        .when(F.col("lang") == "de", 30)
        .otherwise(10)
    )
    return docs.filter(hash_pct(F.col("doc_id")) < rate).select(
        "doc_id", "lang", "source"
    )


def temperature_rates(
    docs: DataFrame, domain: str, temperature: float = 2.0, budget_frac: float = 0.5
) -> DataFrame:
    """Per-domain keep-rate thresholds for temperature-scaled mixing.

    The standard multilingual/data-mix reweighting: sample domains with
    probability q_i ∝ p_i^(1/T) instead of their natural share p_i, so a
    T > 1 flattens the distribution toward low-resource domains. Given a
    row budget B = budget_frac * N, the per-domain Bernoulli keep rate is
    ``min(1, q_i * B / n_i)``, emitted as an integer percent threshold
    ``thr`` for the deterministic hash filter.

    Engine-portability note: with T=2 the exponent is a square root, and
    sqrt / * / / / floor are all correctly-rounded IEEE-754 ops (an
    arbitrary pow(x, 1/T) is NOT). The one op that is *not*
    order-deterministic is sum(sqrt(n)) — float addition is
    non-associative and aggregation order varies by engine and
    partitioning — so the floor gets a +1e-9 guard: a last-ulp
    (~1e-16 relative) reassociation difference can then never flip a
    threshold unless 100*rate sits within 1e-9 of an integer from
    below, which the committed fixtures do not (and the oracle applies
    the identical guard). The domain-count aggregate is a handful of
    rows; everything downstream of it is a broadcast join + scan-side
    predicate.
    """
    if temperature != 2.0:
        raise ValueError(
            "temperature_rates pins T=2 (sqrt) for cross-engine bit-exact "
            "thresholds; generalize with round-before-floor if you need "
            "other temperatures"
        )
    from pyspark.sql.window import Window

    counts = docs.groupBy(domain).agg(F.count(F.lit(1)).cast("double").alias("n"))
    everything = Window.partitionBy()  # counts is domain-cardinality tiny
    wt = F.sqrt(F.col("n"))
    rate = F.least(
        F.lit(1.0),
        wt / F.sum(wt).over(everything)
        * F.sum("n").over(everything) * F.lit(budget_frac) / F.col("n"),
    )
    return counts.select(
        F.col(domain),
        F.floor(F.lit(100) * rate + F.lit(1e-9)).cast("int").alias("thr"),
    )


@register(
    "q_temperature_mix",
    oracle="""
        WITH c AS (
            SELECT lang, CAST(count(*) AS DOUBLE) AS n
            FROM documents GROUP BY lang
        ),
        r AS (
            SELECT lang,
                   CAST(floor(100 * least(
                       1.0,
                       sqrt(n) / sum(sqrt(n)) OVER ()
                       * sum(n) OVER () * 0.5 / n
                   ) + 1e-9) AS INT) AS thr
            FROM c
        )
        SELECT d.doc_id, d.lang, r.thr
        FROM documents d JOIN r ON d.lang = r.lang
        WHERE ((d.doc_id % 2147483648) * 2654435761) % 4294967296 % 100 < r.thr
    """,
    doc="Temperature-scaled corpus mixing (T=2, budget 50%): domain "
    "keep-rates ∝ share^(1/T) / share, normalized to the row budget — "
    "the standard low-resource-language upweighting. Rates come from a "
    "domain-cardinality aggregate (tiny), broadcast-joined back; "
    "membership is the same Knuth-hash scan predicate as "
    "q_stratified_mix, so the cut is reproducible on any partitioning. "
    "T=2 keeps every per-value float op correctly-rounded (sqrt); the "
    "one order-dependent op (the float sum of weights) is absorbed by a "
    "1e-9 floor guard applied identically on both engines.",
    tags=("sampling", "llm-pipeline"),
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    rates = temperature_rates(docs, "lang", temperature=2.0, budget_frac=0.5)
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(hash_pct(F.col("doc_id")) < F.col("thr"))
        .select("doc_id", "lang", "thr")
    )


#: Per-domain epoch weights for q_epoch_upsample: en is downsampled to
#: half an epoch, de repeated 2.4x, everything else seen exactly once.
EPOCH_WEIGHTS = {"en": 0.5, "de": 2.4}


def epoch_upsample(
    docs: DataFrame, domain: str, weights: dict[str, float]
) -> DataFrame:
    """Fractional-epoch repetition — the "see domain X 2.4 times" mixing
    primitive: floor(e) full copies of every row plus one extra copy for
    a deterministic hash-chosen fraction of rows, each tagged with its
    0-based ``epoch`` index.

    Scale shape: a generated-column explode on the scan — no shuffle, no
    join, output rows ≈ sum(n_domain * e_domain). Membership of the
    fractional copy uses ``hash_pct2`` — a SECOND multiplier, because a
    salted key into the same multiplicative hash is only a rotation of
    the same buckets (see KNUTH2) — so this cut composes independently
    with any hash_pct-based cut of the same corpus. Weights are
    percent-exact (floor(100*frac) thresholds), so any engine
    reproduces the row set.
    """
    e = None
    for dom, w in weights.items():
        cond = F.col(domain) == dom
        e = F.when(cond, F.lit(float(w))) if e is None else e.when(cond, F.lit(float(w)))
    e = e.otherwise(F.lit(1.0)) if e is not None else F.lit(1.0)
    full = F.floor(e).cast("int")
    thr = F.floor(F.lit(100) * (e - full) + F.lit(1e-9)).cast("int")
    extra = (hash_pct2(F.col("doc_id")) < thr).cast("int")
    n_copies = full + extra
    return docs.select(
        "doc_id",
        F.col(domain),
        F.posexplode(F.array_repeat(F.lit(1), n_copies)).alias("epoch", "_one"),
    ).drop("_one")


@register(
    "q_epoch_upsample",
    oracle="""
        SELECT doc_id, lang,
               unnest(generate_series(0, n_copies - 1)) AS epoch
        FROM (
            SELECT doc_id, lang,
                   CAST(floor(e) AS INT)
                   + CASE WHEN ((doc_id % 2147483648) * 2246822519)
                              % 4294967296 % 100
                          < CAST(floor(100 * (e - floor(e)) + 1e-9) AS INT)
                     THEN 1 ELSE 0 END AS n_copies
            FROM (
                SELECT doc_id, lang,
                       CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 2.4
                                 ELSE 1.0 END AS e
                FROM documents
            )
        )
    """,
    doc="Fractional-epoch data mixing (en 0.5 epochs, de 2.4, rest 1.0): "
    "floor(e) full copies per row plus a second-multiplier-hash-chosen "
    "fraction getting one more, each output row tagged with its epoch "
    "index. A generated-column explode on the scan — no shuffle, no "
    "join; a second hash multiplier (not a salted key — that is only a "
    "rotation) decorrelates the fractional cut from every other hash "
    "sample of the corpus.",
    tags=("sampling", "llm-pipeline"),
)
def q_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return epoch_upsample(table(spark, sf_dir, "documents"), "lang", EPOCH_WEIGHTS)


def knuth_hash(key: Column) -> Column:
    """Full 32-bit deterministic Knuth hash (the un-bucketed form of
    hash_pct) — the shuffle-free ordering key for deterministic
    greedy selections. Same overflow-safe fold, engine-portable."""
    return (F.pmod(key, F.lit(2147483648)) * F.lit(KNUTH)) % F.lit(4294967296)


def token_budget_sample(
    docs: DataFrame,
    budgets: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Token-budget corpus mixing: per group, keep a deterministic
    greedy PREFIX of documents (Knuth-hash order — stable across runs,
    engines and partitionings) until the group's token budget is
    reached — how production mixtures are actually specified ("w_s of
    the training budget from source s"), where doc-count sampling
    (stratified_by / temperature_rates) misspends budget on sources
    with long documents.

    ``budgets`` is a (group_col, budget) frame — model-sized (one row
    per source), broadcast by the optimizer. A doc is kept iff the
    cumulative token count BEFORE it is under budget, so each group
    overshoots by at most one document (the standard greedy-prefix
    contract; exact token-level truncation is chunking's job —
    packing.py). Scale shape: one window shuffle keyed on the group,
    running-sum frame (WindowExec streams + spills), then the
    broadcast-joined filter; the only wide column (text) is dropped at
    the first projection.

    ``counts`` plugs in a precomputed (id_col, group_col, n_tokens)
    frame — real tokenizer units (bpe.bpe_token_counts) instead of the
    whitespace default. At scale, persist that frame once and reuse it
    across every budget/packing stage."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = (
        counts.select(id_col, group_col, "n_tokens")
        if counts is not None
        else docs.select(
            id_col,
            group_col,
            F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
        )
    )
    scored = base.withColumn("__h", knuth_hash(F.col(id_col)))
    cum = scored.withColumn(
        "__cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        cum.join(F.broadcast(budgets), group_col)
        .filter(F.col("__cum_before") < F.col("budget"))
        .select(id_col, group_col, "n_tokens")
    )


@register(
    "q_token_budget_mix",
    oracle="""
        WITH d AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                   ((doc_id % 2147483648) * 2654435761) % 4294967296 AS h
            FROM documents
        ), tot AS (
            SELECT sum(n_tokens) / 40.0 AS budget FROM d
        ), c AS (
            SELECT doc_id, source, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY source
                                       ORDER BY h, doc_id
                                       ROWS UNBOUNDED PRECEDING)
                       - n_tokens AS cum_before
            FROM d
        )
        SELECT doc_id, source, n_tokens
        FROM c, tot WHERE cum_before < budget
    """,
    doc="Token-budget corpus mixing: uniform per-source budgets of "
    "total_tokens/40 (i.e. a 50% global token budget split over the 20 "
    "sources), each source contributing a deterministic greedy "
    "Knuth-hash-ordered prefix (overshoot <= 1 doc per source). "
    "Hash-proven: DuckDB recomputes the identical hash order, running "
    "sum and budget; the long-vs-double budget comparison is exact on "
    "both engines (token sums are far below 2^53).",
    tags=("E10", "llm-pipeline", "sampling"),
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    total = docs.agg(
        (F.sum(F.size(F.split(F.col("text"), " "))) / 40.0).alias("budget")
    )
    budgets = docs.select("source").distinct().crossJoin(F.broadcast(total))
    return token_budget_sample(docs, budgets)


def priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic and
    engine-portable: priority sampling (Duffield, Lund & Thorup,
    "Priority sampling for estimation of arbitrary subset sums",
    JACM 54(6), 2007). Each row gets priority ``q = u / w`` where
    ``u = (knuth_hash(id)+1) / 2^32`` is a deterministic uniform in
    (0, 1]; the sample is the ``k`` SMALLEST priorities — heavier rows
    get smaller priorities, so inclusion probability rises with
    weight, and every step is reproducible on any partitioning or
    engine (the property a seeded RNG stream loses on repartition —
    see the module docstring).

    Parity discipline: u is an exact dyadic rational (an integer over
    2^32), and both divisions are IEEE-correctly-rounded, so the
    priority DOUBLES are bit-identical across engines — the ordering,
    hence the selected set, cannot diverge (unlike an exp/log-domain
    Efraimidis–Elias key, where libm rounding is not pinned). Rows
    with weight <= 0 carry no mass and are excluded.

    Scale shape: the priority is scan-side arithmetic (no shuffle);
    top-k is TakeOrderedAndProject — per-partition heaps of k rows
    merged once on the driver, never a global sort. The emitted
    ``priority_e8`` is floor(q * 1e8) as an integer — the exactness-
    safe serialization of the double for value-hash comparison."""
    u = (knuth_hash(F.col(id_col)) + 1) / F.lit(4294967296.0)
    q = u / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__q", q)
        .orderBy("__q", id_col)
        .limit(k)
        .select(
            id_col,
            weight_col,
            F.floor(F.col("__q") * 1e8).cast("long").alias("priority_e8"),
        )
    )


@register(
    "q_weighted_sample",
    oracle="""
        WITH p AS (
            SELECT doc_id, n_chars,
                   ((((doc_id % 2147483648) * 2654435761) % 4294967296 + 1)
                    / 4294967296.0) / n_chars AS q
            FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, n_chars,
               CAST(floor(q * 1e8) AS BIGINT) AS priority_e8
        FROM p ORDER BY q, doc_id LIMIT 200
    """,
    doc="Deterministic weighted sampling without replacement (priority "
    "sampling, Duffield-Lund-Thorup JACM'07): 200 documents drawn with "
    "probability increasing in n_chars via hash-derived priorities "
    "u/w. Hash-proven: the priority doubles are exact dyadic-rational "
    "divisions (IEEE correctly rounded on both engines), so DuckDB "
    "reproduces the identical ordering and the identical sample — the "
    "weighted analogue of q_stratified_mix's portable hash cut. Plan: "
    "scan-side arithmetic + TakeOrderedAndProject (per-partition "
    "top-k heaps, no global sort).",
    tags=("E10", "llm-pipeline", "sampling"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return priority_sample(table(spark, sf_dir, "documents"), "n_chars", 200)


def priority_sample_per_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size weighted sample PER GROUP — "exactly k documents per
    language/source, preferring heavy ones" — the stratified form of
    priority_sample (same Duffield-Lund-Thorup priorities, same
    engine-portability argument), selection = the k smallest priorities
    within each group via one windowed row_number.

    Scale shape: priorities are scan-side; one shuffle on the group key
    feeds a per-group sort that WindowExec streams and spills — never a
    global sort, never a driver-side collect. (The un-stratified
    priority_sample keeps its TakeOrderedAndProject shape; this variant
    pays the group shuffle to deliver exact per-stratum counts.)"""
    from pyspark.sql.window import Window

    u = (knuth_hash(F.col(id_col)) + 1) / F.lit(4294967296.0)
    q = u / F.col(weight_col)
    w = Window.partitionBy(group_col).orderBy("__q", id_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__q", q)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            id_col,
            group_col,
            weight_col,
            F.floor(F.col("__q") * 1e8).cast("long").alias("priority_e8"),
        )
    )


@register(
    "q_stratified_fixed_k",
    oracle="""
        WITH p AS (
            SELECT doc_id, lang, n_chars,
                   ((((doc_id % 2147483648) * 2654435761) % 4294967296 + 1)
                    / 4294967296.0) / n_chars AS q
            FROM documents WHERE n_chars > 0
        ), r AS (
            SELECT doc_id, lang, n_chars, q,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY q, doc_id) AS rn
            FROM p
        )
        SELECT doc_id, lang, n_chars,
               CAST(floor(q * 1e8) AS BIGINT) AS priority_e8
        FROM r WHERE rn <= 30
    """,
    doc="Fixed-size weighted sample per stratum: exactly 30 documents "
    "per language, drawn with probability increasing in n_chars via "
    "the same deterministic Duffield-Lund-Thorup priorities as "
    "q_weighted_sample, selected by one per-group window — the "
    "production 'balanced eval slice' cut where proportional sampling "
    "(q_stratified_mix) starves rare strata. Hash-proven: identical "
    "dyadic-rational priorities, identical per-group ranking in DuckDB.",
    tags=("E10", "llm-pipeline", "sampling"),
)
def q_stratified_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return priority_sample_per_group(
        table(spark, sf_dir, "documents"), "lang", "n_chars", 30
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    order_cols: list | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group document cap with a deterministic priority — the
    RefinedWeb-style "at most k documents per domain/source" quota that
    stops any single origin from dominating a mixture, keeping the
    best-ranked rows (default: longest first, id tiebreak — callers
    pass e.g. a quality score). One windowed row_number per group; the
    group shuffle is the whole cost, and at 100 TB the window streams
    per group through WindowExec (no global sort, no collect)."""
    from pyspark.sql.window import Window

    order_cols = order_cols or [F.col("n_chars").desc(), F.col(id_col)]
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


@register(
    "q_source_caps",
    oracle="""
        SELECT doc_id, source, n_chars FROM (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rk
            FROM documents
        ) WHERE rk <= 15
    """,
    doc="Per-source document caps (the RefinedWeb-style domain quota): "
    "at most 15 documents per source, keeping the longest (doc_id "
    "tiebreak) — the mixture-shaping step that stops one origin from "
    "dominating a corpus cut. One per-group window; hash-proven via "
    "the identical ranking in DuckDB.",
    tags=("E10", "llm-pipeline", "sampling"),
)
def q_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cap_per_group(
        table(spark, sf_dir, "documents"), "source", 15
    ).select("doc_id", "source", "n_chars")
