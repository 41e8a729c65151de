"""Char-trigram LM scoring: exact add-one arithmetic on crafted
fixtures, the unseen-trigram floor for batch-vs-reference scoring, and
short-doc exclusion."""

from __future__ import annotations

import math

from udacity_data_engineering_spark.operators.charlm import charlm_score


def test_known_vs_unseen_scoring_against_reference_model(spark):
    """Model trained on 'aaaaaa' (4x trigram 'aaa': N=4, V=1). A batch
    doc of seen trigrams scores ln(5)-ln(5)=0; a fully-unseen doc hits
    the add-one floor exactly: ln(N+V) - ln(0+1) = ln(5)."""
    ref = spark.createDataFrame([(1, "aaaaaa")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "aaaa"), (11, "zzzz")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_trigrams, r.cross_entropy)
        for r in charlm_score(batch, model_docs=ref).collect()
    }
    assert got[10] == (2, 0.0)
    assert got[11] == (2, round(math.log(5), 4))


def test_short_docs_are_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "abcd")], "doc_id long, text string"
    )
    rows = charlm_score(docs).collect()
    assert [r.doc_id for r in rows] == [2]
    assert rows[0].n_trigrams == 2


def test_by_lang_scores_against_own_language_model(spark):
    """Per-language models are independent: the SAME text ('xxxx')
    scores differently under en (where 'xxx' is a minority trigram of a
    model dominated by 'aaa') than under de (where it IS the whole
    model) — exact add-one arithmetic checked per language. A single
    global model would give both copies one blended score."""
    docs = spark.createDataFrame(
        [
            (1, "en", "aaaaaa"),   # en model: 'aaa' c=4, 'xxx' c=2 (doc 3)
            (2, "de", "xxxx"),     # de model: 'xxx' c=4 (docs 2+4)
            (3, "en", "xxxx"),
            (4, "de", "xxxx"),
        ],
        "doc_id long, lang string, text string",
    )
    got = {
        r.doc_id: (r.lang, r.cross_entropy)
        for r in charlm_score(docs, by="lang").collect()
    }
    # en: N=6, V=2 -> ln(8) - ln(c+1)
    assert got[1] == ("en", round(math.log(8) - math.log(5), 4))
    assert got[3] == ("en", round(math.log(8) - math.log(3), 4))
    # de: N=4, V=1 -> ln(5) - ln(5) = 0 exactly
    assert got[2] == ("de", 0.0)
    assert got[4] == got[2]  # same text+lang -> same score
    assert got[3][1] != got[4][1]  # same text, different model -> differs


def test_self_scoring_ranks_typical_below_atypical(spark):
    """Self-perplexity ordering: a doc made of the corpus's dominant
    trigrams must score strictly lower cross-entropy than a one-off
    gibberish doc — the property the curation threshold relies on."""
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3) for i in range(5)]
        + [(99, "qzx jvq wkp zzj qqv bnx")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.cross_entropy for r in charlm_score(docs).collect()}
    assert got[0] < got[99]
    assert all(got[i] == got[0] for i in range(5))  # identical docs, equal score


def test_by_group_external_model_unmodeled_group_null_sentinel(spark):
    """Batch-vs-reference by-group scoring: a batch doc whose group has
    NO model in the reference corpus is still emitted, cross_entropy
    NULL (the explicit unmodeled-group sentinel) — never silently
    dropped, never judged against another group's model."""
    ref = spark.createDataFrame(
        [(10, "en", "aaaaaa")], "doc_id long, lang string, text string"
    )
    batch = spark.createDataFrame(
        [(1, "en", "aaaa"), (2, "fr", "zzzz")],
        "doc_id long, lang string, text string",
    )
    got = {
        r.doc_id: (r.lang, r.cross_entropy)
        for r in charlm_score(batch, model_docs=ref, by="lang").collect()
    }
    assert set(got) == {1, 2}
    # en: model 'aaa' c=4, N=4, V=1 -> ln(5) - ln(5) = 0
    assert got[1] == ("en", 0.0)
    assert got[2] == ("fr", None)
