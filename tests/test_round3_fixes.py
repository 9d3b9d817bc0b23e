"""Round-3 scale/correctness fixes: hot-bucket caps in LSH candidate
generation, AQE-chosen (not forced-broadcast) discard anti-joins,
null-safe stratified sampling, as-of join null-ts hygiene, config-aware
resume invalidation, and non-convergence surfacing in clustering."""

from __future__ import annotations

import json
import logging

import pytest
from pyspark.sql import functions as F

from polars_genson_spark import InferenceConfig
from polars_genson_spark.checkpoint import plan_resume
from polars_genson_spark.operators import dedup
from polars_genson_spark.operators.decontaminate import decontaminate
from polars_genson_spark.operators.incremental import infer_incremental
from polars_genson_spark.operators.relational import asof_join
from polars_genson_spark.operators.sample import stratified_sample
from polars_genson_spark.operators.similarity import ivf_topk, lsh_topk


# --- hot-bucket caps -------------------------------------------------------


@pytest.fixture(scope="module")
def degenerate_docs(spark):
    """12 byte-identical docs + 2 distinct ones: every MinHash band bucket
    and every SimHash chunk bucket of the clones is the same, so uncapped
    candidate generation emits C(12,2)=66 clone pairs."""
    rows = [(i, "the same boilerplate text repeated verbatim here") for i in range(12)]
    rows += [(100, "an entirely different document about spark plans"),
             (101, "yet another unrelated text concerning parquet files")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_bucket_cap_bounds_degenerate_bucket(degenerate_docs):
    uncapped = dedup.minhash_candidates(
        degenerate_docs, num_perm=16, bands=4, min_jaccard=0.5
    )
    assert uncapped.count() == 66
    capped = dedup.minhash_candidates(
        degenerate_docs, num_perm=16, bands=4, min_jaccard=0.5, bucket_max=4
    )
    # every clone bucket holds 12 > 4 entries → dropped → no pairs at all
    assert capped.count() == 0


def test_simhash_bucket_cap(degenerate_docs):
    uncapped = dedup.simhash_candidates(degenerate_docs, max_hamming=3)
    assert uncapped.count() >= 66
    capped = dedup.simhash_candidates(
        degenerate_docs, max_hamming=3, bucket_max=4
    )
    assert capped.count() < uncapped.count()


@pytest.fixture(scope="module")
def clone_vectors(spark):
    """10 identical unit vectors + 3 scattered ones (4-dim)."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(10)]
    rows += [(20, [0.0, 1.0, 0.0, 0.0]), (21, [0.0, 0.0, 1.0, 0.0]),
             (22, [0.0, 0.0, 0.0, 1.0])]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_topk_bucket_cap(clone_vectors):
    uncapped = lsh_topk(clone_vectors, dim=4, k=3, n_planes=2, n_tables=2)
    capped = lsh_topk(
        clone_vectors, dim=4, k=3, n_planes=2, n_tables=2, bucket_max=4
    )
    # the 10-clone bucket exceeds the cap in every table → its pairs gone
    assert capped.count() < uncapped.count()


def test_ivf_bucket_cap(clone_vectors):
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
    uncapped = ivf_topk(
        clone_vectors, dim=4, k=3, n_probe=1, centroids=cents
    )
    capped = ivf_topk(
        clone_vectors, dim=4, k=3, n_probe=1, centroids=cents, bucket_max=4
    )
    assert capped.count() < uncapped.count()


def test_bucket_cap_none_is_identity(degenerate_docs):
    a = dedup.minhash_candidates(degenerate_docs, num_perm=16, bands=4)
    b = dedup.minhash_candidates(
        degenerate_docs, num_perm=16, bands=4, bucket_max=None
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --- discard anti-joins: no forced broadcast -------------------------------


def test_decontaminate_discard_side_not_hint_broadcast(spark):
    corpus = spark.createDataFrame(
        [(i, f"completely unique text number {i} nothing shared") for i in range(30)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "benchmark only words here")], "doc_id long, text string"
    )
    out = decontaminate(corpus, bench, min_shared=1)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    # exactly ONE broadcast hint survives: the benchmark shingle set
    # (genuinely small); the contaminated-id anti-join must be left to AQE
    # because the discard set is corpus-fraction-sized in the worst case
    assert analyzed.count("ResolvedHint") == 1
    assert out.count() == 30  # nothing shared → nothing dropped


# --- null-safe stratified sampling ----------------------------------------


def test_stratified_sample_null_group_falls_through_to_default(spark):
    df = spark.createDataFrame(
        [(1, "src0"), (2, "src0"), (3, None), (4, None)],
        "doc_id long, source string",
    )
    out = stratified_sample(
        df, rates={"src0": (1, 2)}, default_rate=(1, 1), method="mod"
    )
    got = {r["doc_id"] for r in out.collect()}
    # default_rate (1,1) keeps ALL null-group rows; src0 keeps doc_id%2<1
    assert {3, 4} <= got
    assert got & {1, 2} == {2}


# --- as-of join: null right timestamps ------------------------------------


def test_asof_join_ignores_null_right_ts(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 100)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, None, "ghost"), (1, 50, "real")],
        "k long, ts long, tag string",
    )
    out = asof_join(left, right, on="k").orderBy("ts").collect()
    # ts=10 precedes every real right row: no match, and crucially the
    # null-ts payload must NOT be carried as a phantom match
    assert out[0]["asof_ts"] is None and out[0]["asof_tag"] is None
    assert out[1]["asof_ts"] == 50 and out[1]["asof_tag"] == "real"


# --- resume invalidation when manifest lacks config_fp ---------------------


def test_plan_resume_missing_config_fp_invalidates_skips():
    prev = {
        "fingerprints": {"s0": 1},
        "partitions": {"s0": {"passed": True}},
        # no config_fp: pre-upgrade manifest
    }
    todo, skip = plan_resume({"s0": 1}, prev, config_fp="abc123")
    assert todo == ["s0"] and skip == []
    # with a matching fp recorded, the skip is honoured again
    prev["config_fp"] = "abc123"
    todo, skip = plan_resume({"s0": 1}, prev, config_fp="abc123")
    assert todo == [] and skip == ["s0"]


# --- incremental inference: config change re-folds -------------------------


def test_infer_incremental_refolds_on_config_change(spark, tmp_path):
    data = str(tmp_path / "data")
    state = str(tmp_path / "state")
    docs = [{"a": 1}, {"a": 2, "b": "x"}]
    df = spark.createDataFrame(
        [(json.dumps(d),) for d in docs], "j string"
    )
    df.coalesce(1).write.parquet(data)

    r1 = infer_incremental(spark, data, state, "j")
    assert len(r1.new_files) == 1

    # same config → state reused
    r2 = infer_incremental(spark, data, state, "j")
    assert not r2.new_files and len(r2.reused_files) == 1

    # different config → stored summaries are stale → full re-fold
    cfg = InferenceConfig(map_threshold=1)
    r3 = infer_incremental(spark, data, state, "j", config=cfg)
    assert len(r3.new_files) == 1 and not r3.reused_files

    # and the new config's state persists for its own subsequent runs
    r4 = infer_incremental(spark, data, state, "j", config=cfg)
    assert not r4.new_files and len(r4.reused_files) == 1


# --- near_dup_clusters surfaces non-convergence ----------------------------


def test_near_dup_clusters_warns_on_iteration_cap(spark, caplog):
    # path graph 0-1-2-...-7: min-label needs ~diameter rounds; cap at 1
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(7)],
        "id_a long, id_b long, jaccard double",
    )
    with caplog.at_level(logging.WARNING,
                         logger="polars_genson_spark.operators.dedup"):
        out = dedup.near_dup_clusters(
            pairs, max_iterations=1, driver_threshold=0
        )
        n = out.count()
    assert n == 8
    assert any("did not converge" in r.message for r in caplog.records)
    # converged run stays silent
    caplog.clear()
    with caplog.at_level(logging.WARNING,
                         logger="polars_genson_spark.operators.dedup"):
        done = dedup.near_dup_clusters(
            pairs, max_iterations=20, driver_threshold=0
        )
        labels = {r["cluster_id"] for r in done.collect()}
    assert labels == {0}
    assert not any("did not converge" in r.message for r in caplog.records)


# --- alternating-star connected components ---------------------------------


def test_star_components_matches_label_propagation(spark):
    import random

    random.seed(13)
    # random graph: 3 planted components + noise edges inside them
    comp_nodes = [list(range(i * 100, i * 100 + 30)) for i in range(3)]
    edges = []
    for nodes in comp_nodes:
        # spanning chain guarantees connectivity, extras add cycles
        edges += [(a, b, 1.0) for a, b in zip(nodes, nodes[1:])]
        edges += [
            (random.choice(nodes), random.choice(nodes), 1.0)
            for _ in range(20)
        ]
    edges = [(a, b, j) for a, b, j in edges if a != b]
    pairs = spark.createDataFrame(
        edges, "id_a long, id_b long, jaccard double"
    )
    via_label = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.near_dup_clusters(pairs, method="label").collect()
    }
    via_star = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.near_dup_clusters(pairs, method="star").collect()
    }
    assert via_star == via_label
    assert {c for _, c in via_star} == {0, 100, 200}


def test_star_components_long_chain_converges_fast(spark):
    # path graph of diameter 120: label propagation would need ~120
    # rounds; the alternating-star rounds are logarithmic, so the default
    # cap is plenty
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(120)],
        "id_a long, id_b long, jaccard double",
    )
    out = dedup.star_components(pairs, max_iterations=12)
    rows = out.collect()
    assert len(rows) == 121
    assert {r["cluster_id"] for r in rows} == {0}


def test_near_dup_clusters_rejects_unknown_method(spark):
    pairs = spark.createDataFrame(
        [(0, 1, 1.0)], "id_a long, id_b long, jaccard double"
    )
    with pytest.raises(ValueError, match="unknown method"):
        dedup.near_dup_clusters(pairs, method="nope")


# --- review fixes: self-pairs, exact-cap convergence, raw passthrough ------


def test_star_keeps_self_pair_only_nodes(spark):
    pairs = spark.createDataFrame(
        [(5, 5, 1.0), (1, 2, 1.0)], "id_a long, id_b long, jaccard double"
    )
    label = {(r["doc_id"], r["cluster_id"]) for r in
             dedup.near_dup_clusters(pairs, method="label").collect()}
    star = {(r["doc_id"], r["cluster_id"]) for r in
            dedup.near_dup_clusters(pairs, method="star").collect()}
    assert star == label == {(5, 5), (1, 1), (2, 1)}


def test_no_false_warning_when_converged_at_cap(spark, caplog):
    # path 0-1-2 converges in exactly 2 rounds; cap == 2 must NOT warn
    pairs = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "id_a long, id_b long, jaccard double"
    )
    with caplog.at_level(logging.WARNING,
                         logger="polars_genson_spark.operators.dedup"):
        out = dedup.near_dup_clusters(
            pairs, max_iterations=2, driver_threshold=0
        )
        labels = {r["cluster_id"] for r in out.collect()}
    assert labels == {0}
    assert not any("did not converge" in r.message for r in caplog.records)


def test_decode_media_passthrough_raw_rows(spark):
    from polars_genson_spark.operators import multimodal as mm

    raw = mm.synthesize_raw_media(spark, 6, seed=2)
    # idempotent: decoding already-raw rows passes them through unchanged
    once = {r["media_id"]: bytes(r["media"])
            for r in mm.decode_media(raw).collect()}
    direct = {r["media_id"]: bytes(r["media"]) for r in raw.collect()}
    assert once == direct


def test_decode_wav_truncated_fmt_raises_valueerror():
    import struct

    from polars_genson_spark.operators import multimodal as mm

    fmt = struct.pack("<HHI", 1, 1, 8000)  # only 8 bytes
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_wav(wav)


# --- temperature mixing ----------------------------------------------------


def test_temperature_rates_math():
    from polars_genson_spark.operators.sample import temperature_rates

    counts = {"big": 900, "small": 100}
    # T=2: weights 30 / 10 → shares 0.75 / 0.25 of 200 target
    rates = temperature_rates(counts, target_rows=200, temperature=2.0)
    assert rates["big"] == (int(0.75 * 200 / 900 * 1e6), 1_000_000)
    assert rates["small"] == (int(0.25 * 200 / 100 * 1e6), 1_000_000)
    # T→∞ approaches uniform shares
    flat = temperature_rates(counts, target_rows=200, temperature=1e9)
    assert abs(flat["big"][0] / 1e6 - 0.5 * 200 / 900) < 1e-3
    # keep fraction caps at 1 even when the target over-asks a source
    capped = temperature_rates({"a": 10, "b": 1000}, 2000, temperature=1.0)
    assert capped["a"] == (1_000_000, 1_000_000)
    with pytest.raises(ValueError, match="temperature"):
        temperature_rates(counts, 10, temperature=0)


def test_temperature_mix_flattens_skew(spark):
    from polars_genson_spark.operators.sample import temperature_mix

    rows = [(i, "head") for i in range(900)]
    rows += [(i + 1000, "tail") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(df, target_rows=400, temperature=2.0)
    got = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in got}
    # T=2 shares: head 0.75, tail 0.25 → ~300 / ~100 (hash sampling is
    # approximate; generous bounds)
    assert 220 <= by["head"] <= 380
    assert 60 <= by["tail"] <= 100  # tail keep-rate hits the cap at 1.0


def test_curate_semantic_decontamination_stage(spark):
    """A doc whose embedding near-copies a benchmark embedding is dropped
    by the semantic decontamination stage; others survive."""
    from polars_genson_spark.pipeline import CurateConfig, curate

    docs = spark.createDataFrame(
        [(i, f"document body number {i} with several words") for i in range(8)],
        "doc_id long, text string",
    ).withColumn("source", F.lit("s"))
    dim = 8
    base = [[1.0 if d == (i % dim) else 0.0 for d in range(dim)]
            for i in range(8)]
    emb = spark.createDataFrame(
        [(i, base[i]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    bench_emb = spark.createDataFrame(
        [(100, [v * 1.001 for v in base[3]])],
        "vec_id long, embedding array<double>",
    )
    cfg = CurateConfig(near_dup=False, embedding_dim=dim,
                       semantic_threshold=0.95, min_chars=1)
    res = curate(docs, cfg=cfg, embeddings=emb,
                 benchmark_embeddings=bench_emb)
    assert res.stage_counts["semantic_decontaminated"] == 7  # doc 3 gone
    kept = {r["doc_id"] for r in
            res.chunks.select("doc_id").distinct().collect()}
    assert 3 not in kept


def test_star_vs_label_randomized(spark):
    """Randomized cross-check: on seeded random graphs the alternating-
    star labels equal min-label propagation labels exactly."""
    import random

    from polars_genson_spark.operators.dedup import (
        near_dup_clusters,
        star_components,
    )

    for seed in range(12):
        rng = random.Random(seed)
        n = rng.randint(2, 25)
        m = rng.randint(1, 40)
        edges = [
            (rng.randrange(n), rng.randrange(n), 1.0) for _ in range(m)
        ]
        pairs = spark.createDataFrame(
            edges, "id_a long, id_b long, jaccard double"
        )
        a = {(r["doc_id"], r["cluster_id"])
             for r in near_dup_clusters(pairs, max_iterations=40).collect()}
        b = {(r["doc_id"], r["cluster_id"])
             for r in star_components(pairs).collect()}
        assert a == b, f"seed {seed}: {sorted(a ^ b)}"
        if seed < 4:  # distributed label path spot-check (slow)
            c = {(r["doc_id"], r["cluster_id"])
                 for r in near_dup_clusters(
                     pairs, max_iterations=40, driver_threshold=0
                 ).collect()}
            assert c == a, f"seed {seed} dist: {sorted(c ^ a)}"


def test_unicode_corpus_through_curate_and_tokenizer(spark):
    """CJK / emoji / NBSP text flows through the full curate pipeline and
    the BPE train+apply path without crashes, with exact reconstruction
    of the (ASCII-whitespace-split) words."""
    from polars_genson_spark.operators.tokenizer import (
        END,
        bpe_tokenize,
        train_bpe,
    )
    from polars_genson_spark.pipeline import CurateConfig, curate

    rows = [
        (1, "智能 数据 处理 引擎 智能 数据"),
        (2, "données accentuées déjà vu déjà"),
        (3, "emoji 😀😀 text with nbsp inside"),
        (4, "plain ascii words to anchor the vocab"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # max_punct_ratio=1.0: the rule filter's punct heuristic is
    # ASCII-centric (CJK chars count as non-word), which is a per-language
    # threshold question, not a crash — this test asserts unicode SAFETY
    res = curate(
        docs.withColumn("source", F.lit("s")),
        cfg=CurateConfig(near_dup=False, min_chars=1, chunk_size=8,
                         max_punct_ratio=1.0),
    )
    assert res.stage_counts["quality"] == 4 and res.stage_counts["chunks"] > 0

    merges = train_bpe(docs, n_merges=30)
    out = bpe_tokenize(docs, merges).collect()
    assert len(out) == 4
    for r in out:
        text = dict(rows)[r["doc_id"]]
        # reconstruction: concatenated tokens == lowercased words + END
        # markers, under the SAME ascii-whitespace split training used
        # (U+00A0 is NOT a separator on either side)
        joined = "".join(r["bpe_tokens"])
        import re
        words = [w for w in re.split(r"[ \t\n\x0b\f\r]+", text.lower()) if w]
        assert joined == "".join(w + END for w in words)
