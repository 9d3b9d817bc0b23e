"""Round-4 sixth review pass: normalise/sample/multimodal/decontaminate
findings — decode honours the map encoding, mod-sampling fails loud on
non-integral ids, null media rows survive, phantom video frames gone,
NULL-id contamination is removed, and split weights validate as ints.
"""

from __future__ import annotations

import pytest

from polars_genson_spark.config import NormaliseConfig
from polars_genson_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(
        app_name="pgs-tests-r4r6", master="local[4]", shuffle_partitions=4
    )


def test_decode_mapping_encoding_round_trips(spark):
    """decode=True with map_encoding='mapping' must type map fields as
    MapType — the hardcoded kv dtype made from_json null every map."""
    from polars_genson_spark.config import InferenceConfig
    from polars_genson_spark.operators.normalise_op import normalise_json

    # enough distinct keys to trigger map inference (threshold 2)
    docs = [
        '{"labels": {"a": "x", "b": "y", "c": "z"}}',
        '{"labels": {"d": "w", "e": "v"}}',
    ]
    df = spark.createDataFrame([(d,) for d in docs], "doc string")
    cfg = InferenceConfig(map_threshold=2)
    out = normalise_json(
        df, "doc", config=cfg,
        norm=NormaliseConfig(map_encoding="mapping"), decode=True,
    )
    rows = [r["labels"] for r in out.collect()]
    assert {"a": "x", "b": "y", "c": "z"} in rows  # real values, not null
    assert {"d": "w", "e": "v"} in rows


def test_decode_entries_encoding_fails_loud(spark):
    """'entries' ([{k: v}]) has no static Spark type: decode must raise,
    not silently null every map field."""
    from polars_genson_spark.operators.normalise_op import normalise_json

    df = spark.createDataFrame([('{"a": 1}',)], "doc string")
    with pytest.raises(ValueError, match="entries"):
        normalise_json(
            df, "doc", norm=NormaliseConfig(map_encoding="entries"),
            decode=True,
        )


def test_stratified_mod_rejects_string_ids(spark):
    """method='mod' on string ids cast to NULL and silently dropped every
    row; it must reject non-integral id columns instead."""
    from polars_genson_spark.operators.sample import stratified_sample

    df = spark.createDataFrame(
        [("m-0001", "web"), ("m-0002", "web")], "doc_id string, source string"
    )
    with pytest.raises(ValueError, match="integral"):
        stratified_sample(df, {}, method="mod")


def test_stratified_mod_keeps_null_ids(spark):
    """NULL ids under 'mod' must not be silently dropped at rate (1,1)."""
    from polars_genson_spark.operators.sample import stratified_sample

    df = spark.createDataFrame(
        [(1, "web"), (None, "web")], "doc_id int, source string"
    )
    out = stratified_sample(df, {}, method="mod")
    assert out.count() == 2


def test_split_corpus_rejects_float_weights(spark):
    """Float weights passed the >0 check then crashed format(..., '08x')
    with an unrelated error; validate them as positive ints up front."""
    from polars_genson_spark.operators.sample import split_corpus

    df = spark.createDataFrame([("a",)], "doc_id string")
    with pytest.raises(ValueError, match="positive integers"):
        split_corpus(df, weights={"train": 0.98, "val": 0.01, "test": 0.01})


def test_extract_features_null_media_survives(spark):
    """MEDIA_SCHEMA allows null media/meta: the real decoder must emit
    null features for such rows, not TypeError the whole task."""
    from polars_genson_spark.operators.multimodal import (
        extract_features,
        synthesize_codec_media,
    )

    media = synthesize_codec_media(spark, 4)
    nulls = spark.createDataFrame(
        [("null-1", None, None)], media.schema
    )
    out = extract_features(
        media.unionByName(nulls), decoder="real"
    ).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id["null-1"]["features"] is None
    assert by_id["null-1"]["kind"] is None
    real = [r for r in out if r["media_id"] != "null-1"]
    assert all(r["features"] is not None for r in real)


def test_decode_media_null_row_passthrough(spark):
    from polars_genson_spark.operators.multimodal import (
        decode_media,
        synthesize_codec_media,
    )

    media = synthesize_codec_media(spark, 2)
    nulls = spark.createDataFrame([("null-1", None, None)], media.schema)
    out = decode_media(media.unionByName(nulls)).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id["null-1"]["media"] is None and by_id["null-1"]["meta"] is None
    assert len(out) == 3


def test_sample_frames_no_phantom_frames(spark):
    """Zero-duration and NULL-duration videos must emit no frames (the
    old greatest(dur-1, 0) manufactured a t=0 frame for both)."""
    from polars_genson_spark.operators.multimodal import sample_frames

    rows = [
        ("v-ok", ("video", "video/x", None, None, 2500)),
        ("v-zero", ("video", "video/x", None, None, 0)),
        ("v-null", ("video", "video/x", None, None, None)),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, meta struct<kind:string,mime:string,"
        "width:int,height:int,duration_ms:long>",
    )
    out = sample_frames(df, every_ms=1000).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert by_id == {"v-ok": [0, 1000, 2000]}


def test_decontaminate_removes_null_id_contamination(spark):
    """A contaminated row with doc_id=NULL must not survive the anti-join
    (equi-keys never match NULL = NULL) and leak into training data."""
    from polars_genson_spark.operators.decontaminate import decontaminate

    corpus = spark.createDataFrame(
        [
            (None, "the quick brown fox jumps over the lazy dog"),
            ("keep", "completely unrelated text about spark plans here"),
        ],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame(
        [("b1", "the quick brown fox jumps over the lazy dog"),],
        "bench_id string, text string",
    )
    out = decontaminate(corpus, bench, min_shared=3)
    assert [r["doc_id"] for r in out.collect()] == ["keep"]
