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

from .text import _words


def _shingle_hash_expr(n: int) -> str:
    """SQL expression computing the DISTINCT word-n-gram hashes of a
    pre-split words array column ``_w`` — numerically, one pass, without
    ever materialising the shingle strings.

    One ``transform`` over positions, each position a single multi-arg
    ``xxhash64(_w[i-1], ..., _w[i+n-2])``. Two n-grams hash equal iff
    their word sequences are equal, up to 2^-64 collisions — the same
    collision budget the previous string path already accepted for its
    xxhash64(shingle) join keys, and in the same over-drop-only
    direction. The < n-words fallback mirrors
    :func:`..text._raw_shingles`: the whole normalised re-join, hashed
    directly (single-arg vs the n-gram's n-arg fold, so cross-type
    equality is collision-only — matching the string path, where an
    (n-1)-space fallback string can never equal an n-gram with n-1
    separators; NULL text hashes like the string path's NULL fallback
    shingle on both sides).

    Round 6 (guide §1.2 step 2 / §2.3): measured at sf1.0 on the 48k-doc
    corpus side, noop sink — legacy string-shingle array build 2.50s,
    xxhash64-fold via transform+2x(slice+zip_with) 3.95s, THIS plan
    1.41s. The ``_w`` materialisation in a separate projection is
    load-bearing: inlining the split into each element access re-splits
    the text per element (measured 75s). Higher-order lambdas run
    interpreted, so the single transform pass beats three passes plus
    per-position string concats, and array_distinct compares longs, not
    strings.
    """
    idx = ", ".join(f"_w[i{j - 1:+d}]" for j in range(n))
    return (
        f"array_distinct(CASE WHEN size(_w) >= {n} THEN "
        f"transform(sequence(1, size(_w) - {n - 1}), i -> xxhash64({idx})) "
        "ELSE array(xxhash64(array_join(_w, ' '))) END)"
    )


def _shingle_hash_rows(
    df: DataFrame, id_cols: list[str], text_col: str, n: int
) -> DataFrame:
    """(id_cols..., _sh) — one row per raw n-gram-hash per doc, hashes
    already per-doc-distinct.

    explode_outer, not explode: Catalyst's InferFiltersFromGenerate only
    fires for inner generators, and the size(...)>0 / isnotnull(...)
    filter it infers gets pushed below the projection with the FULL
    shingle expression substituted in — the whole regexp+split+hash
    chain ran 3x per row on both sides (the r05 29.2s; see
    plans/r06/decontaminate_trigram_*.txt). The shingle array is never
    NULL and never empty by construction (the fallback branch always
    yields one element), so outer vs inner explode emit identical rows.
    """
    return (
        df.select(*id_cols, _words(text_col).alias("_w"))
        .select(*id_cols, F.expr(_shingle_hash_expr(n)).alias("_shs"))
        .select(*id_cols, F.explode_outer("_shs").alias("_sh"))
    )


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
    # Both sides join on 8-byte n-gram hashes (never shingle strings);
    # see _shingle_hash_expr for the collision budget and the measured
    # kernel choice. Benchmark side stays a broadcast of distinct
    # hashes; nothing corpus-sized shuffles except the (doc, count)
    # rollup, which map-side combines.
    bench_shingles = _shingle_hash_rows(
        benchmark, [], text_col, n
    ).distinct()
    corpus_shingles = _shingle_hash_rows(corpus, [id_col], text_col, n)
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
