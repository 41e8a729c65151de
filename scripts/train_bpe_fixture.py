"""Train the committed BPE tokenizer fixture (run once, output is
version-controlled — the production posture: a tokenizer is trained
once per corpus family and SHIPPED, then every pipeline stage applies
the same pinned merges).

Writes:
  fixtures/bpe/merges.txt      — the ordered merges list, one "a b" per
                                 line (the model, a few hundred bytes)
  fixtures/bpe/word_tokens.csv — (word, n_tokens) for EVERY distinct
                                 word across all three test scales,
                                 encoded with the pure-Python encoder.
                                 This is the DuckDB oracle's lookup
                                 table: the corpus vocabulary is closed
                                 (31 words at every sf), so a per-word
                                 join reproduces the Arrow kernel's
                                 counts exactly.

Training corpus: sf0.001 documents, full corpus (500 docs — sampling
is pointless below the driver-side top-K cap). num_merges=40 keeps
subword structure: this vocabulary is small enough that ~160 merges
would fully fuse every word into one token (the degenerate model);
40 merges leaves frequent words at 1-2 subwords and rare ones at 3+,
the shape a real subword tokenizer produces on natural text.

Usage: python scripts/train_bpe_fixture.py
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from udacity_data_engineering_spark.operators.bpe import (
    FIXTURE_NUM_MERGES,
    encode_word,
    train_bpe,
)

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "fixtures" / "bpe"
SCALES = ("sf0.001", "sf0.01", "sf0.1")


def main() -> None:
    counts = duckdb.sql(
        "SELECT w, CAST(sum(c) AS BIGINT) FROM ("
        "  SELECT unnest(string_split(text, ' ')) AS w, 1 AS c"
        "  FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ") WHERE len(w) > 0 GROUP BY w ORDER BY sum(c) DESC, w"
    ).fetchall()
    merges = train_bpe(counts, num_merges=FIXTURE_NUM_MERGES)

    vocab: set[str] = set()
    for sf in SCALES:
        rows = duckdb.sql(
            "SELECT DISTINCT w FROM ("
            "  SELECT unnest(string_split(text, ' ')) AS w"
            f"  FROM read_parquet('/root/testdata/{sf}/documents.parquet')"
            ") WHERE len(w) > 0"
        ).fetchall()
        vocab.update(r[0] for r in rows)

    ranks = {pair: i for i, pair in enumerate(merges)}
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "merges.txt").write_text(
        "".join(f"{a} {b}\n" for a, b in merges), encoding="utf-8"
    )
    with (OUT / "word_tokens.csv").open("w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["word", "n_tokens"])
        for word in sorted(vocab):
            w.writerow([word, len(encode_word(word, ranks))])
    # (word, tokens-joined-by-|): the oracle lookup for TOKEN-SEQUENCE
    # queries (BPE-unit chunking) — "|" never occurs in tokens (the
    # vocabulary is alphanumeric plus the </w> end-of-word marker)
    with (OUT / "word_token_seqs.csv").open("w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["word", "seq"])
        for word in sorted(vocab):
            toks = encode_word(word, ranks)
            assert all("|" not in t for t in toks), word
            w.writerow([word, "|".join(toks)])
    print(f"wrote {len(merges)} merges, {len(vocab)} vocabulary words -> {OUT}")


if __name__ == "__main__":
    main()
