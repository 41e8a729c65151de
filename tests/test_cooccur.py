"""PMI pairs + per-source KL divergence (operators/cooccur.py) and the
leakage-safe split (corpus.leakage_safe_split)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from udacity_data_engineering_spark.operators.cooccur import (
    pmi_pairs,
    source_divergence,
)
from udacity_data_engineering_spark.operators.corpus import (
    leakage_safe_split,
    train_val_split,
)


@pytest.fixture(scope="module")
def toy_docs(spark):
    # "x y" always co-occur; "z" co-occurs with nothing consistently
    rows = [
        (1, "x y q", "en", "a", 5),
        (2, "x y w", "en", "a", 5),
        (3, "x y e", "en", "b", 5),
        (4, "x y r", "en", "b", 5),
        (5, "z q w", "en", "b", 5),
        (6, "z e r", "en", "a", 5),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_pmi_exact_value(toy_docs):
    got = {
        (r["token_a"], r["token_b"]): (r["pair_docs"], r["pmi"])
        for r in pmi_pairs(toy_docs, vocab_k=100, min_pair_docs=1).collect()
    }
    # x,y co-occur in 4 docs; df_x = df_y = 4; n = 6
    # pmi = ln(6 * 4 / (4 * 4)) = ln(1.5)
    pair_docs, pmi = got[("x", "y")]
    assert pair_docs == 4
    assert pmi == round(math.log(1.5), 6)
    # antisymmetric dupes must not appear
    assert ("y", "x") not in got


def test_pmi_min_pair_docs_filter(toy_docs):
    got = pmi_pairs(toy_docs, vocab_k=100, min_pair_docs=4)
    assert [(r["token_a"], r["token_b"]) for r in got.collect()] == [("x", "y")]


def test_pmi_vocab_cap_bounds_pairs(toy_docs):
    # top-2 vocabulary by doc frequency = {x, y} (df 4, ties broken asc)
    got = pmi_pairs(toy_docs, vocab_k=2, min_pair_docs=1).collect()
    assert {(r["token_a"], r["token_b"]) for r in got} == {("x", "y")}


def test_kl_zero_for_identical_distributions(spark):
    rows = [(1, "a b", "en", "s1", 3), (2, "a b", "en", "s2", 3)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["source"]: r["kl_div"] for r in source_divergence(docs).collect()}
    assert got == {"s1": 0.0, "s2": 0.0}


def test_kl_known_value(spark):
    # s1 = {a:2}, s2 = {b:2}; corpus = {a:2,b:2}
    # KL(s1||corpus) = 1.0*ln(1.0/0.5) = ln 2, same for s2
    rows = [(1, "a a", "en", "s1", 3), (2, "b b", "en", "s2", 3)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["source"]: r["kl_div"] for r in source_divergence(docs).collect()}
    assert got["s1"] == round(math.log(2), 6)
    assert got["s2"] == round(math.log(2), 6)
    ntok = {r["source"]: r["n_tokens"] for r in source_divergence(docs).collect()}
    assert ntok == {"s1": 2, "s2": 2}


def test_leakage_split_components_never_straddle(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    # chain 0-1-2 one cluster; 10-11 another; rest singletons
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "doc_a long, doc_b long"
    )
    out = leakage_safe_split(docs, edges)
    rows = {r["doc_id"]: (r["split_group"], r["split"]) for r in out.collect()}
    assert rows[0] == rows[1] == rows[2]          # whole cluster together
    assert rows[10] == rows[11]
    assert rows[0][0] == 0 and rows[10][0] == 10  # min-id group label

    # singletons degrade to the plain per-id hash split
    plain = {
        r["doc_id"]: r["split"]
        for r in train_val_split(docs, "doc_id").collect()
    }
    for i in range(20, 100):
        assert rows[i] == (i, plain[i])


def test_leakage_split_all_sides_populated(spark):
    docs = spark.createDataFrame(
        [(i, "t") for i in range(500)], "doc_id long, text string"
    )
    edges = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    splits = {
        r["split"]
        for r in leakage_safe_split(docs, edges).select("split").distinct().collect()
    }
    assert splits == {"train", "val", "test"}


# ---------------------------------------------------------------------------
# robust (median/MAD) outliers — lives in stats.py, tested here with the
# other corpus-quality diagnostics


def test_robust_outliers_known_values(spark):
    from udacity_data_engineering_spark.operators.stats import (
        robust_outliers,
    )

    rows = [(i, "en", v) for i, v in enumerate([10, 10, 10, 10, 10, 1000])]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = {
        r["doc_id"]: (r["robust_z"], r["is_outlier"])
        for r in robust_outliers(docs, "n_chars", group="lang").collect()
    }
    # median 10, MAD 0 -> degenerate group: no flags, NULL z
    assert all(z is None and not flag for z, flag in out.values())

    rows = [(i, "en", v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 500])]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = {
        r["doc_id"]: r["is_outlier"]
        for r in robust_outliers(docs, "n_chars", group="lang").collect()
    }
    assert out[9] is True                      # the 500 is flagged
    assert sum(out.values()) == 1              # and only the 500


def test_robust_outliers_grouped_independently(spark):
    from udacity_data_engineering_spark.operators.stats import (
        robust_outliers,
    )

    # 500 is normal for "de" (all large) but an outlier for "en"
    rows = [(i, "en", v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 500])]
    rows += [(100 + i, "de", 490 + i) for i in range(9)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    out = {
        r["doc_id"]: r["is_outlier"]
        for r in robust_outliers(docs, "n_chars", group="lang").collect()
    }
    assert out[8] is True
    assert not any(out[100 + i] for i in range(9))


# ---------------------------------------------------------------------------
# chi-square cells + seasonal anomaly (stats.py round-10 diagnostics)


def test_chisq_independent_table_is_zero(spark):
    from udacity_data_engineering_spark.operators.stats import (
        chi_square_independence,
    )

    # perfectly independent 2x2: every contrib must be exactly 0
    rows = []
    i = 0
    for lang in ("en", "de"):
        for src in ("a", "b"):
            for _ in range(25):
                rows.append((i, lang, src))
                i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = chi_square_independence(df, "lang", "source").collect()
    assert len(out) == 4
    assert all(r["contrib"] == 0.0 and r["expected"] == 25.0 for r in out)


def test_chisq_skewed_cell_dominates(spark):
    from udacity_data_engineering_spark.operators.stats import (
        chi_square_independence,
    )

    rows = [(i, "en", "a") for i in range(90)]
    rows += [(100 + i, "en", "b") for i in range(10)]
    rows += [(200 + i, "de", "a") for i in range(10)]
    rows += [(300 + i, "de", "b") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    cells = {
        (r["lang"], r["source"]): r["contrib"]
        for r in chi_square_independence(df, "lang", "source").collect()
    }
    # symmetric design: all four cells contribute (o-e)^2/e = 32
    assert all(c == 32.0 for c in cells.values())


def test_seasonal_anomaly_flags_only_the_spike(spark):
    from datetime import datetime, timedelta

    from udacity_data_engineering_spark.operators.stats import (
        seasonal_anomaly,
    )

    base = datetime(2024, 1, 1, 9, 0)  # same weekday+hour slot weekly
    rows = [
        (i, "click", base + timedelta(weeks=i), 10.0 + (i % 3))
        for i in range(12)
    ]
    rows.append((99, "click", base + timedelta(weeks=12), 500.0))
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    out = {
        r["event_id"]: r["is_anomaly"]
        for r in seasonal_anomaly(df, "ts", "value", group="event_type").collect()
    }
    assert out[99] is True
    assert sum(out.values()) == 1
