"""Corpus-preparation operators: vocabulary/n-gram counts, deterministic
splits, the training shuffle, normalization, and length trimming.

The SQL-oracle equivalence of each registered query is covered by
test_queries_oracle.py / verify_local.py; these tests pin the semantic
contracts that the hash comparison alone doesn't show (split
determinism across repartitioning, shuffle-write global order, exact
trim band arithmetic).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_data_engineering_spark.operators.corpus import (
    length_trim,
    ngram_counts,
    normalize_text,
    shuffle_key,
    shuffled_write,
    train_val_split,
    vocab_topk,
)
from udacity_data_engineering_spark.session import table


def test_split_survives_repartitioning(spark, sf_dir):
    """The split must be a pure function of the key: any partitioning
    yields identical per-row assignment (randomSplit would not)."""
    docs = table(spark, sf_dir, "documents")
    a = {r.doc_id: r.split for r in train_val_split(docs, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in train_val_split(docs.repartition(17), "doc_id").collect()
    }
    assert a == b
    # rates roughly hold (hash is uniform-ish over the id range)
    n = len(a)
    trains = sum(1 for s in a.values() if s == "train")
    assert 0.8 * n < trains < 0.97 * n


def test_split_covers_every_row_once(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = train_val_split(docs, "doc_id")
    assert out.count() == docs.count()
    assert set(r.split for r in out.select("split").distinct().collect()) <= {
        "train",
        "val",
        "test",
    }


def test_shuffled_write_is_globally_ordered_without_global_sort(
    spark, sf_dir, tmp_path
):
    """Files produced by shuffled_write, read back in partition order,
    are globally ordered by the shuffle key — proving the range
    partition + within-partition sort achieves a global order with no
    single-partition sort anywhere."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    out = str(tmp_path / "shuffled")
    shuffled_write(docs, "doc_id", out, buckets=8)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    skey, _ = shuffle_key(F.col("doc_id"))
    # global order == sorted by skey: reconstruct file order via input_file_name
    rows = (
        back.withColumn("f", F.input_file_name())
        .withColumn("k", skey)
        .collect()
    )
    by_file: dict[str, list[int]] = {}
    for r in rows:
        by_file.setdefault(r.f, []).append(r.k)
    files_sorted = sorted(by_file, key=lambda f: min(by_file[f]))
    flat = [k for f in files_sorted for k in by_file[f]]
    assert flat == sorted(flat)


def test_length_trim_band_arithmetic(spark):
    """Exact integer band: n=20 -> keep ranks 2..19 (> 20*5//100=1,
    <= 20*95//100=19) — 18 rows, dropping the single smallest and
    largest."""
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "doc_id long, n_chars long"
    )
    kept = length_trim(df).select("doc_id").collect()
    ids = sorted(r.doc_id for r in kept)
    assert ids == list(range(1, 19))


def test_vocab_and_ngram_tiebreaks_are_deterministic(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    v1 = [tuple(r) for r in vocab_topk(docs, k=10).collect()]
    v2 = [tuple(r) for r in vocab_topk(docs.repartition(13), k=10).collect()]
    assert v1 == v2
    g1 = [tuple(r) for r in ngram_counts(docs, k=10).collect()]
    g2 = [tuple(r) for r in ngram_counts(docs.repartition(13), k=10).collect()]
    assert g1 == g2


def test_normalize_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "Hello, WORLD!!  multi  space"), (2, "already clean"), (3, "")],
        "doc_id long, text string",
    )
    once = normalize_text(df).select("doc_id", F.col("norm_text").alias("text"))
    twice = normalize_text(once)
    got = {r.doc_id: (r.text, r.norm_text) for r in twice.collect()}
    assert got[1] == ("hello world multi space",) * 2
    assert got[2] == ("already clean",) * 2
    assert got[3] == ("",) * 2


def test_word_ngrams_custom_and_regex_special_sep(spark):
    """sep is a literal: it tokenizes AND joins, even when it's a regex
    metachar (the advisor's word_ngrams finding)."""
    from udacity_data_engineering_spark.functions.arrays import word_ngrams

    df = spark.createDataFrame([(1, "a|b|c|d")], "doc_id long, text string")
    got = df.select(word_ngrams(F.col("text"), 2, sep="|").alias("g")).first().g
    assert got == ["a|b", "b|c", "c|d"]
    got3 = df.select(word_ngrams(F.col("text"), 3, sep="|").alias("g")).first().g
    assert got3 == ["a|b|c", "b|c|d"]
    # default space sep unchanged
    df2 = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    assert df2.select(
        word_ngrams(F.col("text"), 2).alias("g")
    ).first().g == ["x y", "y z"]


def test_quality_classifier_separates_and_orders_sensibly(spark, sf_dir):
    """The fused-SQL classifier must actually separate the corpus (both
    labels present) and score in the right direction: more stopwords
    (natural prose) raises the score, more repetition lowers it."""
    from udacity_data_engineering_spark.operators.quality import (
        classifier_score,
        gopher_signals,
    )
    from udacity_data_engineering_spark.session import table

    scored = classifier_score(gopher_signals(table(spark, sf_dir, "documents")))
    labels = {r.keep for r in scored.select("keep").distinct().collect()}
    assert labels == {True, False}

    prose = "the cat sat on the mat and then the dog was in the house"
    spam = "buy buy buy buy buy buy buy buy buy buy buy buy buy buy"
    df = spark.createDataFrame(
        [(1, prose), (2, spam)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.score
        for r in classifier_score(gopher_signals(df)).collect()
    }
    assert got[1] > got[2], got
