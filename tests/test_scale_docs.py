"""Planted-structure scale corpus: the small-scale correctness side of
the ≥10M-row scale-proof run (BENCH.md "Round-4 scale-proof").

The generator (sources/scale_docs.py) plants, by doc_id range: a hot
LSH-bucket template region, near-dup clusters, exact-dup pairs, junk,
then unique docs. These tests verify at 2k rows that each planted
region drives exactly the pipeline stage it was designed to stress —
so when the same generator runs at 10M rows, the stage counts in the
scale run are checkable against the layout's closed-form expectations.
"""

import logging

import pytest
from pyspark.sql import functions as F

from polars_genson_spark.pipeline import CurateConfig, curate
from polars_genson_spark.sources.scale_docs import (
    ScaleLayout,
    default_layout,
    generate_benchmark,
    generate_benchmark_embeddings,
    generate_doc_embeddings,
    generate_documents,
)

LAY = ScaleLayout(
    n_rows=2000,
    hot_docs=60,
    near_clusters=40,
    cluster_size=3,
    exact_groups=50,
    junk_docs=20,
)


@pytest.fixture(scope="module")
def docs(spark):
    return generate_documents(spark, LAY.n_rows, 42, layout=LAY).cache()


def test_deterministic_across_partitionings(spark, docs):
    other = generate_documents(spark, LAY.n_rows, 42, layout=LAY, partitions=3)
    assert docs.exceptAll(other).count() == 0
    assert other.exceptAll(docs).count() == 0


def test_layout_closed_forms():
    lay = default_layout(10_000_000)
    # the 10M default layout must actually force the distributed-CC path
    assert lay.near_edges_symmetrized > 100_000
    assert lay.exact_losers == lay.exact_groups
    assert lay.near_losers == 2 * lay.near_clusters


def test_exact_region_byte_equal_pairs(docs):
    ex = docs.where(
        (F.col("doc_id") >= LAY.near_end) & (F.col("doc_id") < LAY.exact_end)
    )
    sizes = {
        r["count"]
        for r in ex.groupBy("text").count().select("count").distinct().collect()
    }
    assert sizes == {2}


def test_near_clusters_pairwise_jaccard(docs):
    """Within-cluster 3-gram Jaccard must clear the 0.8 default (the
    layout promises ≈ (W-2)/W = 0.933 for W=30 base words)."""
    from polars_genson_spark.operators.dedup import ngram_jaccard_pairs

    near = docs.where(
        (F.col("doc_id") >= LAY.hot_end) & (F.col("doc_id") < LAY.near_end)
    )
    pairs = ngram_jaccard_pairs(
        near, id_col="doc_id", text_col="text", n=3, min_jaccard=0.8
    )
    got = pairs.count()
    # 3 pairs per cluster, and no cross-cluster pair sneaks past 0.8
    assert got == LAY.near_clusters * 3
    within = pairs.where(
        ((F.col("id_a") - LAY.hot_end) / LAY.cluster_size).cast("long")
        == ((F.col("id_b") - LAY.hot_end) / LAY.cluster_size).cast("long")
    ).count()
    assert within == got


def test_hot_region_trips_bucket_cap(docs, caplog):
    """All hot-template docs collide into one band bucket per band; any
    bucket_max below the region size must trip the cap and drop them
    from candidate generation."""
    from polars_genson_spark.operators.dedup import minhash_candidates

    hot = docs.where(F.col("doc_id") < LAY.hot_end)
    with caplog.at_level(logging.WARNING, logger="polars_genson_spark.operators.dedup"):
        cand = minhash_candidates(
            hot,
            id_col="doc_id",
            text_col="text",
            min_jaccard=0.8,
            bucket_max=16,
        )
        assert cand.count() == 0
    assert any("dropping" in r.message for r in caplog.records)
    # and without the cap the same region IS one near-dup clique
    uncapped = minhash_candidates(
        hot, id_col="doc_id", text_col="text", min_jaccard=0.8
    )
    assert uncapped.count() > 0


def test_curate_full_chain_stage_counts(spark, docs):
    """End-to-end curate over the planted corpus: every stage's delta
    matches the layout's closed form (hot region survives dedup because
    the bucket cap dropped its candidates — the documented recall
    trade; junk dies at the quality gate; benchmark copies die at
    decontamination)."""
    emb = generate_doc_embeddings(
        spark, 400, dim=16, group_size=4, n_groups=20, seed=42
    )
    bench = generate_benchmark(spark, LAY, n_bench=10)
    bench_emb = generate_benchmark_embeddings(spark, n_bench=5, dim=16)
    cfg = CurateConfig(
        minhash_bucket_max=16,
        embedding_dim=16,
        semantic_clusters=4,
        chunk_size=64,
    )
    res = curate(
        docs,
        benchmark=bench,
        cfg=cfg,
        embeddings=emb,
        benchmark_embeddings=bench_emb,
    )
    sc = res.stage_counts
    assert sc["input"] == LAY.n_rows
    assert sc["exact_dedup"] == LAY.n_rows - LAY.exact_losers
    # near dedup removes 2 of 3 per planted cluster; hot region survives
    # (cap dropped its buckets)
    assert sc["exact_dedup"] - sc["near_dedup"] == LAY.near_losers
    # semantic dedup: 20 groups of 4 near-identical vectors -> keep 1
    # each; of the 60 discards, those in the near-dup loser set are
    # already gone, so the delta is <= 60 and >= 60 - near region size
    sem_drop = sc["near_dedup"] - sc["semantic_dedup"]
    assert 0 < sem_drop <= 60
    # benchmark embeddings hit the first 5 semantic groups: their
    # surviving representative is decontaminated
    assert sc["semantic_dedup"] - sc["semantic_decontaminated"] == 5
    # 10 benchmark copies of unique-region docs (none overlap the junk
    # or dup regions) die at n-gram decontamination
    assert sc["semantic_decontaminated"] - sc["decontaminated"] == 10
    # junk dies at the quality gate
    assert sc["decontaminated"] - sc["quality"] == LAY.junk_docs
    assert res.chunks.count() >= sc["quality"]


def test_distributed_cc_engages_on_planted_edges(spark, docs, caplog):
    """Force the distributed label-propagation path (driver_threshold=0)
    on the planted near-dup edges and check it matches the driver
    union-find labels exactly."""
    from polars_genson_spark.operators.dedup import (
        minhash_candidates,
        near_dup_clusters,
        ngram_jaccard_pairs,
    )

    near = docs.where(
        (F.col("doc_id") >= LAY.hot_end) & (F.col("doc_id") < LAY.near_end)
    )
    pairs = ngram_jaccard_pairs(
        near, id_col="doc_id", text_col="text", n=3, min_jaccard=0.8
    ).cache()
    with caplog.at_level(logging.INFO, logger="polars_genson_spark.operators.dedup"):
        dist = near_dup_clusters(pairs, driver_threshold=0)
        drv = near_dup_clusters(pairs, driver_threshold=1_000_000)
        assert dist.exceptAll(drv).count() == 0
        assert drv.exceptAll(dist).count() == 0
    msgs = [r.message for r in caplog.records]
    assert any("DISTRIBUTED" in m for m in msgs)
    assert any("driver union-find" in m for m in msgs)
