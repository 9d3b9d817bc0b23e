"""Benchmark decontamination: flag training documents that share n-gram
shingles with an evaluation/benchmark set.

The standard pre-training hygiene step (the reference engine has no
equivalent; semantics follow the usual n-gram-overlap definition used by
open-data pipelines): a candidate document is contaminated when it shares
at least ``min_shared`` distinct word n-grams with ANY benchmark document.

Scale shape: the benchmark set is small (thousands of eval docs) — its
distinct shingle set is broadcast, so the corpus-side plan is a single
scan + explode + broadcast semi-join + groupBy(doc). Nothing shuffles at
corpus scale except the (doc_id, n_shared) rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_shingles


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """(doc_id, n_shared) for corpus docs sharing >= min_shared distinct
    word n-grams with the benchmark set."""
    # Both sides join on xxhash64(shingle) rather than the shingle string:
    # 8-byte probe keys instead of ~20-40-byte strings shrink the
    # broadcast table and the hash-probe work (measured 6-7% at sf0.1,
    # tools_decon_bench.py; the win grows with shingle width). Collisions
    # merge two distinct shingles with probability 2^-64 per pair —
    # expected extra matches over a 10^10-shingle corpus x 10^6-shingle
    # bench set ~ 5e-4, and the direction is over-drop, never a leak.
    bench_shingles = (
        with_shingles(benchmark, text_col, n)
        .select(F.explode("shingles").alias("shingle"))
        .select(F.xxhash64("shingle").alias("_sh"))
        .distinct()
    )
    corpus_shingles = with_shingles(corpus, text_col, n).select(
        F.col(id_col), F.explode("shingles").alias("shingle")
    ).select(id_col, F.xxhash64("shingle").alias("_sh"))
    hits = corpus_shingles.join(F.broadcast(bench_shingles), "_sh")
    return (
        hits.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Corpus minus contaminated docs.

    No broadcast hint on the discard side: the contaminated set is
    corpus-fraction-sized in the worst case (a leaky benchmark can match
    a large slice of a web corpus), so forcing a broadcast risks OOM at
    scale. AQE broadcasts it automatically when it is actually small; the
    fallback is a shuffle anti-join on the id. (The *benchmark shingle*
    broadcast inside :func:`contaminated_docs` stays — eval sets are
    genuinely small.)"""
    bad = contaminated_docs(
        corpus, benchmark, id_col, text_col, n, min_shared
    ).select(F.col(id_col).alias("_bad_id"))
    # null-safe anti-join: a plain equi-key never matches NULL = NULL, so
    # contaminated rows with a NULL id would silently SURVIVE and ship in
    # training data. NULL-id docs all group under one id upstream, so if
    # that merged group crosses min_shared, every NULL-id row is dropped —
    # conservative in the safe direction (over-drop, never leak)
    return corpus.join(
        bad,
        F.col(id_col).eqNullSafe(F.col("_bad_id")),
        "left_anti",
    )
