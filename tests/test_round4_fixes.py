"""Round-4 regression tests: VERDICT r03 "Next round" items and ADVICE
fixes — deterministic packing, id-dtype passthrough in the BPE apply,
string-id tie-breaks in semantic decontamination, and hot-bucket cache
release."""

from __future__ import annotations

import pytest

from polars_genson_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(
        app_name="pgs-tests", master="local[4]", shuffle_partitions=4
    )


def _chunk_rows():
    # several docs × several chunks, sizes chosen so bins genuinely share
    rows = []
    for d in range(12):
        for c in range((d % 4) + 1):
            size = 2 + (d * 7 + c * 3) % 9
            rows.append((d, c, [d * 100 + c] * size))
    return rows


def _pack_key(r):
    return (tuple(r["tokens"]), tuple(r["boundaries"]), tuple(r["source_ids"]))


def test_pack_sequences_deterministic_across_partitionings(spark):
    """deterministic=True yields identical packs (tokens, boundaries,
    source ids, fill ratios) regardless of how the input happens to be
    partitioned — the property the curate CLI now relies on."""
    from polars_genson_spark.operators.text import pack_sequences

    rows = _chunk_rows()
    schema = "doc_id long, chunk_id int, chunk_tokens array<int>"
    layouts = [
        spark.createDataFrame(rows, schema).coalesce(1),
        spark.createDataFrame(list(reversed(rows)), schema).repartition(7),
        spark.createDataFrame(rows, schema).repartition(3, "chunk_id"),
    ]
    results = [
        sorted(
            _pack_key(r)
            for r in pack_sequences(
                df,
                context_len=16,
                pad_id=0,
                deterministic=True,
                num_partitions=4,
                order_cols=["doc_id", "chunk_id"],
            ).collect()
        )
        for df in layouts
    ]
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 1  # real multi-pack output, not a trivial case

    # and WITHOUT an explicit num_partitions it still runs (session conf)
    base = pack_sequences(
        layouts[0], context_len=16, deterministic=True
    ).collect()
    assert sum(r["n_tokens"] for r in base) == sum(
        len(t) for _, _, t in rows
    )


def test_curate_packs_reproducible_across_input_layouts(spark, tmp_path):
    """Two `curate` runs over the SAME documents written with DIFFERENT
    partition layouts produce identical packs end-to-end."""
    from polars_genson_spark.pipeline import CurateConfig, curate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a_path = str(tmp_path / "a")
    b_path = str(tmp_path / "b")
    docs.repartition(8).write.parquet(a_path)
    docs.orderBy("n_chars").coalesce(2).write.parquet(b_path)

    cfg = CurateConfig(
        chunk_size=64,
        chunk_overlap=16,
        pack_context_len=256,
        pack_pad_id=0,
        near_dup=False,
    )
    outs = []
    for p in (a_path, b_path):
        res = curate(spark.read.parquet(p), None, cfg)
        outs.append(sorted(_pack_key(r) for r in res.chunks.collect()))
    assert outs[0] == outs[1]


def test_bpe_apply_string_ids(spark):
    """bpe_tokenize / bpe_tokenize_ids keep the input id dtype — a
    string-id corpus (the validate token-table shape) must tokenize, not
    fail at Arrow conversion (ADVICE r03)."""
    from polars_genson_spark.operators.tokenizer import (
        bpe_tokenize,
        bpe_tokenize_ids,
        train_bpe_with_vocab,
    )

    df = spark.createDataFrame(
        [("doc-a", "low lower lowest"), ("doc-b", "new newer newest")],
        "doc_id string, text string",
    )
    merges, vocab = train_bpe_with_vocab(df, n_merges=10)
    out = bpe_tokenize_ids(df, merges, vocab).collect()
    assert {r["doc_id"] for r in out} == {"doc-a", "doc-b"}
    assert all(r["n_tok"] > 0 for r in out)
    out2 = bpe_tokenize(df, merges).collect()
    assert {r["doc_id"] for r in out2} == {"doc-a", "doc-b"}


def test_semantic_decontaminate_string_ids(spark):
    """String ids survive the (cosine DESC, id ASC) tie-break — the
    negated-id max-struct silently NULLed them (ADVICE r03)."""
    from polars_genson_spark.operators.similarity import (
        semantic_decontaminate,
    )

    dim = 4
    vecs = [
        ("c1", [1.0, 0.0, 0.0, 0.0]),
        ("c2", [0.0, 1.0, 0.0, 0.0]),
    ]
    bench = [
        # two benchmark rows IDENTICAL to c1's vector: tie on cosine=1.0,
        # must resolve to the lexicographically smaller bench id
        ("b2", [1.0, 0.0, 0.0, 0.0]),
        ("b1", [1.0, 0.0, 0.0, 0.0]),
    ]
    c = spark.createDataFrame(vecs, "vec_id string, embedding array<double>")
    b = spark.createDataFrame(bench, "vec_id string, embedding array<double>")
    out = semantic_decontaminate(c, b, dim=dim, threshold=0.9).collect()
    assert len(out) == 1
    row = out[0]
    assert row["id"] == "c1"
    assert row["bench_id"] == "b1"  # not NULL, and the ASC tie-break
    assert row["max_cosine"] == pytest.approx(1.0)


def test_cap_hot_buckets_releases_cache(spark):
    """_cap_hot_buckets must not leave its rollup pinned in storage when
    hot buckets exist (ADVICE r03 leak)."""
    from pyspark.sql import functions as F

    from polars_genson_spark.operators.dedup import _cap_hot_buckets

    before = {
        r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    entries = spark.range(200).select(
        F.lit(0).alias("band"),
        F.lit(7).alias("bucket"),
        F.col("id"),
    )
    capped = _cap_hot_buckets(entries, ["band", "bucket"], 50, "test")
    assert capped.count() == 0  # the single hot bucket is dropped
    after = {
        r.id() for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }
    assert after <= before  # no newly-pinned storage survives the call
