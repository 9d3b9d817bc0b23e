"""The vectorized Arrow BPE apply kernel must be bit-identical to the
reference per-word loop kernel.

``tokenizer._make_apply_arrow`` replaces the per-word-occurrence Python
loop with factorize + ragged-gather numpy index arithmetic and builds
the output ListArray from offsets directly. Nothing about the output is
allowed to change: same token streams, same counts, same handling of
NULL/empty text, NULL ids, unicode words, seeded vs unseeded caches,
and cache overflow. These tests pin loop↔vector equality on every one
of those axes; the measured A/B lives in BENCH.md (round-5 section).
"""

from __future__ import annotations

import pytest

from polars_genson_spark.operators.tokenizer import (
    bpe_tokenize,
    bpe_tokenize_ids,
    train_bpe_with_vocab,
)

TEXTS = [
    ("d1", "the quick brown fox jumps over the lazy dog the the"),
    ("d2", ""),
    ("d3", None),
    ("d4", "lower LOWER lowest low newer newest wide wider widest"),
    ("d5", "tab\tsep\nnewline  multi   space\x0bvtab\fformfeed\rcr"),
    ("d6", "ünïcødé wörds ünïcødé  nbsp-is-not-a-split"),
    ("d7", "x"),
    ("d8", "repeated repeated repeated repeated"),
    (None, "null id row words here"),
    ("d9", "   "),
]


def _key(rows):
    return sorted((r[0] or "", list(r[1]), int(r[2])) for r in rows)


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(TEXTS, "doc_id string, text string")
    merges, vocab, words = train_bpe_with_vocab(
        df, n_merges=60, return_words=True
    )
    return df, merges, vocab, words


def test_vector_matches_loop_token_strings(corpus):
    df, merges, _, words = corpus
    loop = bpe_tokenize(df, merges, seed_words=words, impl="loop")
    vec = bpe_tokenize(df, merges, seed_words=words, impl="vector")
    assert _key(loop.collect()) == _key(vec.collect())


def test_vector_matches_loop_token_ids(corpus):
    df, merges, vocab, words = corpus
    loop = bpe_tokenize_ids(df, merges, vocab, seed_words=words, impl="loop")
    vec = bpe_tokenize_ids(df, merges, vocab, seed_words=words, impl="vector")
    assert _key(loop.collect()) == _key(vec.collect())


def test_vector_matches_loop_unseeded_cache(corpus):
    """No seed → every word goes through the cache path."""
    df, merges, vocab, _ = corpus
    loop = bpe_tokenize_ids(df, merges, vocab, impl="loop")
    vec = bpe_tokenize_ids(df, merges, vocab, impl="vector")
    assert _key(loop.collect()) == _key(vec.collect())


def test_vector_cache_overflow_clear(corpus):
    """cache_max=1 forces a clear on (almost) every unique word — the
    overflow path must not change output."""
    df, merges, vocab, _ = corpus
    loop = bpe_tokenize_ids(df, merges, vocab, cache_max=1, impl="loop")
    vec = bpe_tokenize_ids(df, merges, vocab, cache_max=1, impl="vector")
    assert _key(loop.collect()) == _key(vec.collect())


def test_vector_schema_and_dtypes(corpus):
    df, merges, vocab, words = corpus
    vec = bpe_tokenize_ids(df, merges, vocab, seed_words=words)
    assert [f.simpleString() for f in vec.schema.fields] == [
        "doc_id:string",
        "tokens:array<int>",
        "n_tok:int",
    ]
    strs = bpe_tokenize(df, merges, seed_words=words)
    assert strs.schema["bpe_tokens"].dataType.simpleString() == (
        "array<string>"
    )


def test_vector_is_default(corpus):
    """The default impl IS the vector kernel (BENCH.md A/B: it wins),
    and it equals the loop kernel output."""
    df, merges, vocab, words = corpus
    default = bpe_tokenize_ids(df, merges, vocab, seed_words=words)
    loop = bpe_tokenize_ids(
        df, merges, vocab, seed_words=words, impl="loop"
    )
    assert _key(default.collect()) == _key(loop.collect())


def test_vector_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id string, text string")
    merges = [("t", "h"), ("th", "e</w>")]
    vocab = {"<unk>": 0, "</w>": 1, "t": 2, "h": 3, "e": 4,
             "th": 5, "the</w>": 6}
    assert bpe_tokenize_ids(df, merges, vocab, impl="vector").count() == 0


def test_vector_random_parity(spark):
    """Random mixed-content corpus (ascii words, unicode, numbers,
    punctuation runs, long words) — loop and vector agree exactly."""
    import random

    rng = random.Random(20260819)
    alphabet = "abcdefghij"
    pieces = [
        lambda: "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12))),
        lambda: str(rng.randint(0, 10**6)),
        lambda: rng.choice(["http://ex.com/a?b=1", "foo_bar", "x+y=z", "…", "日本語"]),
    ]
    rows = []
    for i in range(300):
        n = rng.randint(0, 30)
        text = " ".join(rng.choice(pieces)() for _ in range(n))
        rows.append((f"r{i}", text))
    df = spark.createDataFrame(rows, "doc_id string, text string").repartition(7)
    merges, vocab, words = train_bpe_with_vocab(
        df, n_merges=120, return_words=True
    )
    loop = bpe_tokenize_ids(df, merges, vocab, seed_words=words, impl="loop")
    vec = bpe_tokenize_ids(df, merges, vocab, seed_words=words, impl="vector")
    assert _key(loop.collect()) == _key(vec.collect())
