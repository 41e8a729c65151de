"""Sampling contracts: hash sampling is reproducible under any
partitioning (the property RNG sampling lacks); approx distinct stays
inside its error bound; stratified RNG rates land near nominal."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.sampling import (
    deterministic_sample,
    stratified_by,
)
from udacity_data_engineering_spark.plans.registry import all_queries
from udacity_data_engineering_spark.session import table


def test_hash_sample_invariant_under_repartition(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 30).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(17), "doc_id", 30).collect()
    }
    assert a == b
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # ~30% of a uniform key


def test_hash_sample_is_monotone_in_rate(spark, sf_dir):
    """A 10% cut is a subset of the 50% cut — rate increases only add
    rows, never swap them (the property that lets a corpus grow its
    sample without resampling history)."""
    docs = table(spark, sf_dir, "documents")
    small = {r.doc_id for r in deterministic_sample(docs, "doc_id", 10).collect()}
    big = {r.doc_id for r in deterministic_sample(docs, "doc_id", 50).collect()}
    assert small <= big


def test_approx_distinct_within_error_bound(spark, sf_dir):
    qs = all_queries()
    exact = {
        r.o_orderstatus: r.n_cust
        for r in qs["q_count_distinct"].fn(spark, sf_dir).collect()
    }
    approx = {
        r.o_orderstatus: r.n_cust_approx
        for r in qs["q_approx_distinct"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(2, 0.05 * v), (k, v, approx[k])


def test_stratified_rng_rates_near_nominal(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    fractions = {lang: 0.5 for lang in langs}
    got = stratified_by(docs, "lang", fractions).count()
    n = docs.count()
    assert 0.3 * n < got < 0.7 * n


def test_hash_pct_no_overflow_above_2_32(spark):
    """Keys above ~3.5e9 used to overflow int64 in key*KNUTH (ADVICE r1);
    folding first keeps the product exact and matches DuckDB's arithmetic."""
    import duckdb

    from udacity_data_engineering_spark.operators.sampling import hash_pct

    keys = [0, 1, 97, 2**31 - 1, 2**31, 2**40, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k: r.b for r in df.select("k", hash_pct(F.col("k")).alias("b")).collect()}
    con = duckdb.connect()
    for k in keys:
        want = con.execute(
            f"SELECT ((({k} % 2147483648) * 2654435761) % 4294967296) % 100"
        ).fetchone()[0]
        assert got[k] == want, (k, got[k], want)


def test_temperature_mix_flattens_distribution(spark, sf_dir):
    """T=2 mixing must pull every domain's sampled share toward uniform:
    over-represented langs get rate < 1, the rarest lang keeps the most.
    Compares max/min share ratio before vs after — after must be flatter."""
    from udacity_data_engineering_spark.operators.sampling import q_temperature_mix
    from udacity_data_engineering_spark.session import table

    docs = table(spark, sf_dir, "documents")
    nat = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    mixed = q_temperature_mix(spark, sf_dir)
    got = {r["lang"]: r["n"] for r in mixed.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) == set(nat)  # no domain dropped entirely
    skew = lambda d: max(d.values()) / min(d.values())
    assert skew(got) < skew(nat), (nat, got)


def test_temperature_rates_clamped_and_integer(spark, sf_dir):
    from udacity_data_engineering_spark.operators.sampling import temperature_rates
    from udacity_data_engineering_spark.session import table

    docs = table(spark, sf_dir, "documents")
    rates = temperature_rates(docs, "lang").collect()
    assert all(0 <= r["thr"] <= 100 for r in rates), rates
    # a budget_frac of 0.5 with T=2 upweighting must clamp no rate above 100
    # while keeping at least one domain below 100 (something is downsampled)
    assert any(r["thr"] < 100 for r in rates), rates


def test_epoch_upsample_matches_weights(spark, sf_dir):
    """Realized copies per domain must track the fractional epoch
    weights: de ~2.4x its corpus count, en ~0.5x, others exactly 1x —
    and epoch indices are dense from 0."""
    from udacity_data_engineering_spark.operators.sampling import (
        EPOCH_WEIGHTS,
        epoch_upsample,
    )

    docs = table(spark, sf_dir, "documents")
    nat = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    up = epoch_upsample(docs, "lang", EPOCH_WEIGHTS)
    got = {r.lang: r.n for r in up.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in nat.items():
        w = EPOCH_WEIGHTS.get(lang, 1.0)
        ratio = got.get(lang, 0) / n
        assert abs(ratio - w) < 0.2, (lang, w, ratio)
    # integer-weight domains are exact, fractional ones are hash-chosen
    exact = [l for l in nat if EPOCH_WEIGHTS.get(l, 1.0) == int(EPOCH_WEIGHTS.get(l, 1.0))]
    for lang in exact:
        assert got[lang] == nat[lang] * int(EPOCH_WEIGHTS.get(lang, 1.0))
    assert up.agg(F.min("epoch")).first()[0] == 0


def test_hash_cuts_compose_independently(spark, sf_dir):
    """Composed sampling must behave like independent draws: the joint
    keep-rate of a hash_pct cut and a hash_pct2 cut over the same keys
    must be ~the product of the marginals. (A salted key into the SAME
    multiplicative hash fails this badly — it is an affine rotation,
    giving joint rates of 0 or 2x; that regression is why hash_pct2
    exists.)"""
    from udacity_data_engineering_spark.operators.sampling import (
        hash_pct,
        hash_pct2,
    )

    docs = table(spark, sf_dir, "documents")
    n = docs.count()
    joint = docs.filter(
        (hash_pct(F.col("doc_id")) < 30) & (hash_pct2(F.col("doc_id")) < 40)
    ).count()
    expected = 0.30 * 0.40
    assert abs(joint / n - expected) < 0.05, (joint / n, expected)


def test_token_budget_sample_contract(spark):
    """Greedy-prefix contract vs a plain-Python recompute: per group,
    keep exactly the docs whose cumulative tokens BEFORE them (in
    Knuth-hash, doc_id order) are under budget — overshoot <= 1 doc,
    zero budget selects nothing, and the result is partitioning-
    invariant."""
    from udacity_data_engineering_spark.operators.sampling import (
        KNUTH,
        token_budget_sample,
    )

    rows = []
    did = 0
    for src, lens in (("a", [5, 3, 8, 2]), ("b", [10, 1]), ("c", [4])):
        for L in lens:
            rows.append((did, src, " ".join(["w"] * L)))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budgets = spark.createDataFrame(
        [("a", 9.0), ("b", 100.0), ("c", 0.0)], "source string, budget double"
    )

    def h(k):
        return ((k % 2147483648) * KNUTH) % 4294967296

    want = set()
    for src in ("a", "b", "c"):
        grp = sorted(
            ((h(d), d, len(t.split())) for d, s, t in rows if s == src)
        )
        budget = {"a": 9.0, "b": 100.0, "c": 0.0}[src]
        cum = 0
        for _, d, n in grp:
            if cum < budget:
                want.add(d)
            cum += n

    for reparted in (docs, docs.repartition(7)):
        got = {
            r.doc_id
            for r in token_budget_sample(reparted, budgets).collect()
        }
        assert got == want
    assert not any(
        r.source == "c"
        for r in token_budget_sample(docs, budgets).collect()
    )
