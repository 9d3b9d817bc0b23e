"""Incremental schema-inference maintenance + per-group inference."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from polars_genson_spark import InferenceConfig, infer_json_schema
from polars_genson_spark.operators.incremental import (
    IncrementalResult,
    infer_incremental,
    infer_json_schema_by_group,
    load_state,
)


def _write_docs(spark, path, docs, mode="append"):
    df = spark.createDataFrame([(json.dumps(d),) for d in docs], "j string")
    df.coalesce(1).write.mode(mode).parquet(path)


def test_infer_incremental_folds_only_new_files(spark, tmp_path):
    data = str(tmp_path / "data")
    state = str(tmp_path / "state")

    _write_docs(spark, data, [{"a": 1}, {"a": 2, "b": "x"}])
    r1 = infer_incremental(spark, data, state, "j")
    assert r1.processed_count == 2
    assert len(r1.new_files) == 1 and not r1.reused_files
    assert sorted(r1.schema["properties"]) == ["a", "b"]
    assert r1.schema["required"] == ["a"]

    # second run, nothing new: zero files folded, same schema
    r2 = infer_incremental(spark, data, state, "j")
    assert not r2.new_files and len(r2.reused_files) == 1
    assert r2.schema == r1.schema
    assert r2.processed_count == 2

    # append a file that widens a: int → number and adds c
    _write_docs(spark, data, [{"a": 1.5, "c": True}])
    r3 = infer_incremental(spark, data, state, "j")
    assert len(r3.new_files) == 1 and len(r3.reused_files) == 1
    assert r3.processed_count == 3
    assert r3.schema["properties"]["a"] == {"type": "number"}
    assert "c" in r3.schema["properties"]
    assert r3.schema.get("required") is None or "c" not in r3.schema["required"]

    # the incremental schema equals a from-scratch inference
    full = infer_json_schema(spark.read.parquet(data), "j")
    assert r3.schema == full.schema
    assert r3.processed_count == full.processed_count


def test_infer_incremental_drops_deleted_files(spark, tmp_path):
    d1 = str(tmp_path / "d1")
    d2 = str(tmp_path / "d2")
    combined = str(tmp_path / "all")
    state = str(tmp_path / "state")
    _write_docs(spark, combined, [{"a": 1}])
    _write_docs(spark, combined, [{"zzz": "only here"}])
    r1 = infer_incremental(spark, combined, state, "j")
    assert "zzz" in r1.schema["properties"]

    # remove the file containing zzz by rewriting the dataset without it
    files = sorted(
        f for f in os.listdir(combined) if f.endswith(".parquet")
    )
    # find and delete the parquet file containing zzz
    for f in files:
        df = spark.read.parquet(os.path.join(combined, f))
        if df.where(F.col("j").contains("zzz")).count():
            os.remove(os.path.join(combined, f))
    r2 = infer_incremental(spark, combined, state, "j")
    assert "zzz" not in r2.schema["properties"]
    assert not r2.new_files  # nothing folded, state entry dropped
    st = load_state(state)
    assert all("zzz" not in json.dumps(v) for v in st["files"].values())


def test_infer_by_group(spark):
    rows = [
        ("g1", json.dumps({"a": 1})),
        ("g1", json.dumps({"a": 2, "b": "x"})),
        ("g2", json.dumps({"k": True})),
        ("g2", json.dumps({"k": False, "n": 1.5})),
        ("g3", None),  # null-only group → zero processed
    ]
    df = spark.createDataFrame(rows, "grp string, j string").repartition(4)
    out = {
        r["grp"]: r.asDict()
        for r in infer_json_schema_by_group(df, "j", "grp").collect()
    }
    g1 = json.loads(out["g1"]["schema_json"])
    assert sorted(g1["properties"]) == ["a", "b"]
    assert g1["required"] == ["a"]
    assert out["g1"]["processed"] == 2
    g2 = json.loads(out["g2"]["schema_json"])
    assert g2["properties"]["n"] == {"type": "number"}
    assert out["g3"]["processed"] == 0

    # partition-layout invariance
    out2 = {
        r["grp"]: r["schema_json"]
        for r in infer_json_schema_by_group(
            df.repartition(1), "j", "grp"
        ).collect()
    }
    assert {k: v["schema_json"] for k, v in out.items()} == out2


def test_infer_by_group_error_isolation(spark):
    rows = [
        ("ok", json.dumps({"a": 1})),
        ("bad", "{not json"),
    ]
    df = spark.createDataFrame(rows, "grp string, j string")
    out = {
        r["grp"]: r.asDict()
        for r in infer_json_schema_by_group(df, "j", "grp").collect()
    }
    assert out["ok"]["error"] is None
    assert out["ok"]["schema_json"] is not None
    assert "Invalid JSON" in out["bad"]["error"]
    assert out["bad"]["schema_json"] is None


def test_schema_drift_detects_field_changes(spark):
    """Fields appearing, vanishing, and changing type across windows are
    named in the per-window diff; stable windows diff empty."""
    from polars_genson_spark.operators.incremental import schema_drift

    rows = (
        [("d1", '{"a": 1}')] * 3
        + [("d2", '{"a": 1, "b": "x"}')] * 3          # b added
        + [("d3", '{"a": "s", "b": "x"}')] * 3        # a int->string
        + [("d4", '{"b": "x"}')] * 3                  # a removed
        + [("d5", '{"b": "x"}')] * 3                  # stable
    )
    df = spark.createDataFrame(rows, "w string, doc string")
    out = {r["window"]: r.asDict() for r in schema_drift(df, "doc", "w").collect()}
    assert set(out) == {"d2", "d3", "d4", "d5"}
    assert out["d2"]["added"] == ["b"] and out["d2"]["changed"] == []
    assert out["d3"]["changed"] == ["a"]
    assert out["d4"]["removed"] == ["a"]
    assert out["d5"] == {"window": "d5", "added": [], "removed": [], "changed": []}


def test_schema_drift_survives_error_window(spark):
    """A window whose inference errored (invalid JSON) becomes an
    all-null diff row; later good windows diff against the last GOOD
    baseline (code-review finding r2-2)."""
    from polars_genson_spark.operators.incremental import schema_drift

    rows = (
        [("d1", '{"a": 1}')] * 2
        + [("d2", "not json at all {{{")] * 2          # errors
        + [("d3", '{"a": 1, "b": 2}')] * 2             # vs d1: b added
    )
    df = spark.createDataFrame(rows, "w string, doc string")
    out = {r["window"]: r.asDict() for r in schema_drift(df, "doc", "w").collect()}
    assert set(out) == {"d2", "d3"}
    assert out["d2"]["added"] is None and out["d2"]["changed"] is None
    assert out["d3"]["added"] == ["b"]
