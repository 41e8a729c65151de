"""BPE tokenizer exactness — trainer and encoder pinned byte-for-byte
against an independent pure-Python reference implementation.

The reference encoder here applies merges SEQUENTIALLY in rank order
(each merge replaced throughout the word before the next is
considered) — a different algorithm from the production encoder's
repeat-lowest-applicable-rank loop. For any TRAINED merges table the
two are provably equivalent (a merge's constituents are products of
strictly earlier merges, so a later merge can never enable an earlier
one), which makes agreement a real cross-check rather than the same
code twice.
"""

from __future__ import annotations

import csv
import os
import random
from pathlib import Path

import pytest

from udacity_data_engineering_spark.operators.bpe import (
    BPE_DIR,
    EOW,
    bpe_token_counts,
    bpe_tokenize,
    encode_word,
    load_merges,
    train_bpe,
    train_bpe_merges,
)


def ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent reference: apply each merge in training order,
    replacing all non-overlapping occurrences left to right."""
    sym = list(word) + [EOW]
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


TRAIN_TEXT = (
    "the quick brown fox jumps over the lazy dog "
    "she sells sea shells by the sea shore "
    "lowest lower lowered newest newer widest wider "
    "tokenize tokenizer tokenized tokens "
    "def tokenize(text): return text.split() "
    "for word in words: counts[word] += 1"
)


def train_counts() -> list[tuple[str, int]]:
    counts: dict[str, int] = {}
    for w in TRAIN_TEXT.split(" "):
        if w:
            counts[w] = counts.get(w, 0) + 1
    return sorted(counts.items())


def test_train_matches_hand_computed_merges():
    """Tiny corpus where the merge sequence is hand-checkable:
    'abab' x3 and 'ab' x2 — ('a','b') dominates (8 occurrences), then
    ('ab','ab') vs ('ab','</w>'): ab+ab occurs 3x, ab+</w> occurs 5x
    (3 word-final + 2 whole-word), so ('ab','</w>') is second."""
    merges = train_bpe([("abab", 3), ("ab", 2)], num_merges=3)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("ab", EOW)
    # after merge 2: 'abab' = (ab, ab</w>) — pair count 3 >= 2, merged
    assert merges[2] == ("ab", "ab" + EOW)


def test_train_is_input_order_independent():
    base = train_counts()
    shuffled = base[:]
    random.Random(7).shuffle(shuffled)
    assert train_bpe(base, 50) == train_bpe(shuffled, 50)


def test_train_stops_when_no_pair_repeats():
    # every word unique, every char distinct -> max pair count is 1
    merges = train_bpe([("abc", 1), ("xyz", 1)], num_merges=100)
    assert merges == []


def test_encode_matches_reference_on_trained_and_unseen_words():
    merges = train_bpe(train_counts(), num_merges=60)
    assert 20 < len(merges) <= 60  # early-stops when no pair repeats
    ranks = {p: i for i, p in enumerate(merges)}
    seen = [w for w, _ in train_counts()]
    unseen = [
        "lowestest",
        "tokenizers",
        "quickly",
        "shoreline",
        "zzz",
        "a",
        "Ω≈ç",  # symbols never in training stay single chars
        "the",
    ]
    for w in seen + unseen:
        got = encode_word(w, ranks)
        want = ref_encode(w, merges)
        assert got == want, f"{w!r}: {got} != {want}"
        # lossless round-trip: concatenation restores word + EOW
        assert "".join(got) == w + EOW


def test_committed_fixture_roundtrips_with_encoder():
    """Guards fixture/code drift: re-encoding every vocabulary word
    under the committed merges must reproduce word_tokens.csv (which
    the DuckDB oracles join against)."""
    merges = load_merges()
    ranks = {p: i for i, p in enumerate(merges)}
    with (Path(BPE_DIR) / "word_tokens.csv").open() as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 31  # the closed corpus vocabulary
    for r in rows:
        assert len(encode_word(r["word"], ranks)) == int(r["n_tokens"])
        assert ref_encode(r["word"], merges) == encode_word(r["word"], ranks)


def test_fixture_vocabulary_is_closed_over_every_corpus_scale():
    """The q_bpe_token_counts / *_bpe oracles join word_tokens.csv;
    an out-of-vocabulary word (or an unexpected NULL-vs-empty text
    shape) would silently diverge oracle counts from the kernel's
    char-fallback encoding. Assert closure against EVERY testdata
    scale so the oracle-parity claim is corpus-proven, not assumed."""
    duckdb = pytest.importorskip("duckdb")
    lut = {r["word"] for r in csv.DictReader((Path(BPE_DIR) / "word_tokens.csv").open())}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        pq = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(pq):
            continue
        words = duckdb.sql(
            f"""SELECT DISTINCT w FROM (
                    SELECT unnest(string_split(coalesce(text,''), ' ')) AS w
                    FROM '{pq}') WHERE w <> ''"""
        ).fetchall()
        oov = sorted({w for (w,) in words} - lut)
        assert not oov, f"{sf}: out-of-vocabulary words break the LUT oracle: {oov[:10]}"


@pytest.fixture(scope="module")
def trained():
    merges = train_bpe(train_counts(), num_merges=60)
    return merges, {p: i for i, p in enumerate(merges)}


def test_spark_kernel_token_sequences_match_reference(spark, trained):
    merges, _ = trained
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "tokenize the tokens tokenizer"),
            (3, "unseen wordzz Ω≈ç the"),
            (4, None),
            (5, "  double  spaces  "),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bpe_tokenize(docs, merges).collect()}

    def want_tokens(text):
        toks = []
        for w in text.split(" "):
            if w:
                toks.extend(ref_encode(w, merges))
        return toks

    for doc_id, text in [(1, "the quick brown fox"),
                         (2, "tokenize the tokens tokenizer"),
                         (3, "unseen wordzz Ω≈ç the")]:
        assert list(got[doc_id].tokens) == want_tokens(text)
        assert got[doc_id].n_tokens == len(want_tokens(text))
        assert got[doc_id].n_words == len(text.split())
    assert got[4].n_words == 0 and got[4].n_tokens == 0 and got[4].tokens == []
    assert got[5].n_words == 2  # empty splits skipped


def test_spark_counts_keep_cols_and_invariant(spark, trained):
    merges, _ = trained
    docs = spark.createDataFrame(
        [(1, "en", "the fox"), (2, "de", "tokenize tokens")],
        "doc_id long, lang string, text string",
    )
    rows = {
        r.doc_id: r
        for r in bpe_token_counts(docs, merges, keep_cols=("lang",)).collect()
    }
    assert rows[1].lang == "en" and rows[2].lang == "de"
    for r in rows.values():
        assert r.n_tokens >= r.n_words  # a word is >= 1 subword


def test_distributed_training_matches_local(spark):
    """train_bpe_merges (distributed word count + top-K + driver merge
    loop) equals pure-local training on the same corpus."""
    texts = [(i, TRAIN_TEXT) for i in range(8)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    dist = train_bpe_merges(docs, num_merges=30)
    local = train_bpe([(w, 8 * c) for w, c in train_counts()], num_merges=30)
    assert dist == local


def test_counts_plug_matches_whitespace_default(spark):
    """Plugging a counts frame that IS the whitespace count must
    reproduce the default path exactly — pins the pluggable-counts
    refactor of token_budget_sample / length_bucket_batches."""
    from pyspark.sql import functions as F

    from udacity_data_engineering_spark.operators.packing import (
        length_bucket_batches,
    )
    from udacity_data_engineering_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 3), "w " * (i % 17 + 1)) for i in range(60)],
        "doc_id long, source string, text string",
    ).withColumn("text", F.trim("text"))
    counts = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    budgets = docs.select("source").distinct().withColumn("budget", F.lit(30))
    a = sorted(token_budget_sample(docs, budgets).collect())
    b = sorted(token_budget_sample(docs, budgets, counts=counts).collect())
    assert a == b and a
    x = sorted(length_bucket_batches(docs, width=4, batch_size=8).collect())
    y = sorted(
        length_bucket_batches(docs, width=4, batch_size=8, counts=counts).collect()
    )
    assert x == y and x
