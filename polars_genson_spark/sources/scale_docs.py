"""Deterministic web-scale documents corpus with planted dedup structure.

The sf* testdata tables verify correctness at small scale; this module
exists to *scale-prove* the curate/tokenize chain: it synthesises a
documents table of arbitrary size (10M+ rows) entirely with JVM-side
expressions (``spark.range`` + hash transforms — no driver loop, no
Python UDF), planting exactly the degenerate structures whose handling
the engine claims to get right at 100 TB:

- a **hot template region**: ``hot_docs`` near-identical docs (one shared
  template + a per-doc unique suffix word) whose MinHash band buckets all
  collide — at any realistic ``bucket_max`` this MUST trip the
  hot-bucket cap in ``dedup._cap_hot_buckets`` (one bucket of L docs is
  otherwise an L² candidate cross-product);
- a **near-duplicate region**: ``near_clusters`` clusters of
  ``cluster_size`` members (shared base text + unique suffix; pairwise
  3-gram Jaccard ≈ (W-2)/W ≈ 0.93 for W=30 base words) — sized so the
  symmetrized verified-edge set exceeds ``near_dup_clusters``'s
  ``driver_threshold`` and the *distributed* connected-components path
  engages;
- an **exact-duplicate region**: ``exact_groups`` pairs with byte-equal
  text (caught by the xxhash64 groupBy stage);
- a **junk region**: ``junk_docs`` docs failing the quality gate
  (too short / punct-heavy);
- the rest: unique docs of 20–40 words.

Words come from a fixed synthetic vocabulary ("w0000".."w19999", Zipf-ish
via u²·V) so BPE training finds real merges and the tokenizer apply path
gets realistic unique-word cache hit rates. Sources are skewed
(HEAVY_SOURCE ≈ 50% of rows) to exercise the salted-write path.

Everything is a pure function of (id, seed) via xxhash64, so the corpus
is bit-reproducible at any parallelism — required for the two-cluster-
size scaling evidence (same input at local[8] and local[32]).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 20_000
HEAVY_SOURCE = "web-01"
SOURCES = ["web-02", "books", "wiki", "code", "news"]


@dataclass(frozen=True)
class ScaleLayout:
    """Id-range layout of the planted regions (all half-open ranges)."""

    n_rows: int
    hot_docs: int
    near_clusters: int
    cluster_size: int
    exact_groups: int
    junk_docs: int

    @property
    def hot_end(self) -> int:
        return self.hot_docs

    @property
    def near_end(self) -> int:
        return self.hot_end + self.near_clusters * self.cluster_size

    @property
    def exact_end(self) -> int:
        return self.near_end + self.exact_groups * 2

    @property
    def junk_end(self) -> int:
        return self.exact_end + self.junk_docs

    @property
    def unique_start(self) -> int:
        return self.junk_end

    def __post_init__(self) -> None:
        if self.junk_end > self.n_rows:
            raise ValueError(
                f"planted regions ({self.junk_end} rows) exceed "
                f"n_rows={self.n_rows}"
            )

    # expected survivor deltas, for tests and BENCH bookkeeping
    @property
    def exact_losers(self) -> int:
        return self.exact_groups  # one of each pair

    @property
    def near_losers(self) -> int:
        return self.near_clusters * (self.cluster_size - 1)

    @property
    def near_edges_symmetrized(self) -> int:
        k = self.cluster_size
        return self.near_clusters * k * (k - 1)


def default_layout(n_rows: int, seed: int = 42) -> ScaleLayout:
    """Regions scale with the corpus so the stress stays proportionate:
    at 10M rows → 40k hot docs, 40k near clusters (240k symmetrized
    edges > the 100k driver_threshold), 100k exact pairs, 100k junk."""
    del seed  # layout is size-driven; seed only affects content
    return ScaleLayout(
        n_rows=n_rows,
        hot_docs=max(8, n_rows // 250),
        near_clusters=max(4, n_rows // 250),
        cluster_size=3,
        exact_groups=max(2, n_rows // 100),
        junk_docs=max(1, n_rows // 100),
    )


def _h(seed: int, *cols):
    return F.abs(F.xxhash64(*cols, F.lit(seed)))


def _word(seed: int, tag: str, key, j):
    """Vocabulary word for content key (tag, key) at position j —
    Zipf-ish: index = floor(u² · V), so low indices are frequent (real
    BPE merges, realistic shingle document frequencies) without any
    single 3-gram dominating the inverted index."""
    u = (_h(seed, F.lit(tag), key, j) % F.lit(1_000_000)) / F.lit(1_000_000.0)
    idx = (u * u * F.lit(VOCAB - 1)).cast("int")
    return F.concat(F.lit("w"), F.lpad(idx.cast("string"), 5, "0"))


def _base_text(seed: int, tag: str, key, n_words):
    words = F.transform(
        F.sequence(F.lit(1), n_words), lambda j: _word(seed, tag, key, j)
    )
    return F.array_join(words, " ")


def generate_documents(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    layout: ScaleLayout | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """The planted-structure documents table:
    (doc_id long, text string, lang string, source string, n_chars long)
    — same schema as the driver's sf* documents.parquet."""
    lay = layout or default_layout(n_rows, seed)
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism * 2)
    df = spark.range(0, n_rows, 1, partitions).withColumnRenamed(
        "id", "doc_id"
    )
    did = F.col("doc_id")

    near_cluster = ((did - F.lit(lay.hot_end)) / F.lit(lay.cluster_size)).cast(
        "long"
    )
    exact_group = ((did - F.lit(lay.near_end)) / F.lit(2)).cast("long")

    suffix = F.concat(F.lit(" u"), did.cast("string"))
    text = (
        F.when(
            did < lay.hot_end,
            # one shared 45-word template + unique suffix: near-identical
            # but NOT byte-equal (survives exact dedup, floods one LSH
            # bucket per band)
            F.concat(_base_text(seed, "hot", F.lit(0), F.lit(45)), suffix),
        )
        .when(
            did < lay.near_end,
            # 30 shared words per cluster + unique suffix → pairwise
            # 3-gram Jaccard = 28/30 ≈ 0.93 within a cluster
            F.concat(_base_text(seed, "near", near_cluster, F.lit(30)), suffix),
        )
        .when(
            did < lay.exact_end,
            # byte-equal within each pair (no suffix)
            _base_text(seed, "exact", exact_group, F.lit(25)),
        )
        .when(
            did < lay.junk_end,
            # fails the quality gate on punct ratio (>0.3 even with an
            # 8-digit id); unique per doc so exact dedup does NOT sweep
            # the junk region and stage accounting stays closed-form
            F.concat(F.lit("!!!???!!! j"), did.cast("string")),
        )
        .otherwise(
            _base_text(
                seed,
                "uniq",
                did,
                (F.lit(20) + (_h(seed, F.lit("nw"), did) % F.lit(21))).cast(
                    "int"
                ),
            )
        )
    )

    pick = _h(seed, F.lit("src"), did) % F.lit(100)
    src = F.when(pick < 50, F.lit(HEAVY_SOURCE)).otherwise(
        F.element_at(
            F.array(*[F.lit(s) for s in SOURCES]),
            (pick % F.lit(len(SOURCES))).cast("int") + 1,
        )
    )
    lang = F.when(
        _h(seed, F.lit("lang"), did) % F.lit(10) == 0, F.lit("de")
    ).otherwise(F.lit("en"))

    return df.select(
        did,
        text.alias("text"),
        lang.alias("lang"),
        src.alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def generate_doc_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 64,
    group_size: int = 4,
    n_groups: int | None = None,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Embeddings for doc ids [0, n_vecs): (vec_id long, embedding
    array<float>). Ids below ``n_groups * group_size`` share a per-group
    base vector plus 1e-3 jitter (within-group cosine ≈ 1 → SemDeDup
    keeps exactly one); the rest are unique pseudo-random vectors
    (cross cosine ≪ 0.9 at dim 64).

    Covering a *sampled prefix* of the corpus is the realistic shape:
    embeddings are produced by an upstream model over a sample, not over
    every raw doc — and it keeps SemDeDup's cluster-local self-join
    bounded (n_clusters must grow ~√n with the embedded population)."""
    if n_groups is None:
        n_groups = max(1, n_vecs // (group_size * 5))
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism * 2)
    df = spark.range(0, n_vecs, 1, partitions).withColumnRenamed(
        "id", "vec_id"
    )
    vid = F.col("vec_id")
    grouped = vid < F.lit(n_groups * group_size)
    group = (vid / F.lit(group_size)).cast("long")
    key = F.when(grouped, group).otherwise(F.lit(1_000_000_000) + vid)

    def component(j):
        base = (
            (_h(seed, F.lit("emb"), key, j) % F.lit(2001)) - F.lit(1000)
        ) / F.lit(1000.0)
        jitter = F.when(
            grouped,
            ((_h(seed, F.lit("embj"), vid, j) % F.lit(100)) / F.lit(100.0))
            * F.lit(0.001),
        ).otherwise(F.lit(0.0))
        return (base + jitter).cast("float")

    vec = F.transform(F.sequence(F.lit(1), F.lit(dim)), component)
    return df.select(vid, vec.alias("embedding"))


def generate_benchmark(
    spark: SparkSession,
    layout: ScaleLayout,
    n_bench: int = 500,
    seed: int = 42,
) -> DataFrame:
    """Benchmark docs whose text byte-copies corpus unique-region docs
    [unique_start, unique_start + n_bench) — the n-gram decontamination
    stage must drop exactly those corpus docs (min_shared=3 trigrams is
    trivially met by a full copy)."""
    avail = layout.n_rows - layout.unique_start
    if n_bench > avail:
        # silently copying nonexistent corpus docs would break the
        # "drops exactly these" contract the closed-form stage
        # accounting (and its tests) relies on
        raise ValueError(
            f"n_bench={n_bench} exceeds the corpus unique region "
            f"({avail} rows past unique_start={layout.unique_start} of "
            f"n_rows={layout.n_rows}); shrink n_bench or grow the corpus"
        )
    df = spark.range(0, n_bench, 1, 4).withColumnRenamed("id", "bench_id")
    target = F.col("bench_id") + F.lit(layout.unique_start)
    n_words = (F.lit(20) + (_h(seed, F.lit("nw"), target) % F.lit(21))).cast(
        "int"
    )
    return df.select(
        F.col("bench_id"),
        _base_text(seed, "uniq", target, n_words).alias("text"),
    )


def generate_benchmark_embeddings(
    spark: SparkSession,
    n_bench: int = 200,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Benchmark-side vectors equal to the first ``n_bench`` semantic
    group base vectors (zero jitter) — semantic decontamination must
    drop the τ-close corpus survivors of those groups."""
    df = spark.range(0, n_bench, 1, 4).withColumnRenamed("id", "vec_id")
    key = F.col("vec_id")  # == group id g

    def component(j):
        return (
            (
                (_h(seed, F.lit("emb"), key, j) % F.lit(2001)) - F.lit(1000)
            )
            / F.lit(1000.0)
        ).cast("float")

    vec = F.transform(F.sequence(F.lit(1), F.lit(dim)), component)
    return df.select(F.col("vec_id"), vec.alias("embedding"))
