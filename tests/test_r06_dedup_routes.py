"""Round-6 optimization internals: the infer fold's first-occurrence
cell cache and normalise_json's distinct-route must be invisible in
results — only in wall-clock.

The dedup route triggers when (>=8 input partitions) AND (a 10k-row
sample is full AND <=50% distinct); the direct path runs otherwise.
These tests pin: route parity (same rows out either way, decode both
ways), null/blank handling through the broadcast join, processed_count
counting repeats, and schema equality under replication.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

import polars_genson_spark as pgs


@pytest.fixture(scope="module")
def spark():
    from polars_genson_spark.session import get_spark

    s = get_spark(
        app_name="r06-dedup-routes",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s


def _replicated_docs(spark, n_distinct=40, copies=300):
    # > 10k rows so the sample is full; 40 distinct => ratio ~0.004
    docs = [
        json.dumps({"id": i, "name": f"doc-{i}", "tags": [i, i + 1]})
        for i in range(n_distinct)
    ]
    rows = [(i, docs[i % n_distinct]) for i in range(n_distinct * copies)]
    return spark.createDataFrame(rows, "row_id long, payload string")


def test_normalise_dedup_route_matches_direct(spark):
    df = _replicated_docs(spark)
    wide = df.repartition(16)     # >=8 partitions -> dedup route
    narrow = df.coalesce(2)       # <8 partitions  -> direct path
    a = (
        pgs.normalise_json(wide, "payload", output_col="norm")
        .select("row_id", "norm")
        .collect()
    )
    b = (
        pgs.normalise_json(narrow, "payload", output_col="norm")
        .select("row_id", "norm")
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == wide.count()


def test_normalise_dedup_route_decode_matches_direct(spark):
    df = _replicated_docs(spark)
    a = (
        pgs.normalise_json(
            df.repartition(16), "payload", decode=True, unnest=False,
            output_col="norm",
        )
        .select("row_id", F.to_json("norm").alias("j"))
        .collect()
    )
    b = (
        pgs.normalise_json(
            df.coalesce(2), "payload", decode=True, unnest=False,
            output_col="norm",
        )
        .select("row_id", F.to_json("norm").alias("j"))
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_normalise_dedup_route_nulls_and_blanks(spark):
    # null / blank / unparseable cells must normalise to null through
    # the broadcast join exactly as on the direct path
    base = [(i, json.dumps({"k": i % 5})) for i in range(12000)]
    base += [(90001, None), (90002, "   "), (90003, "{not json")]
    df = spark.createDataFrame(base, "row_id long, payload string")
    # inference is strict on invalid JSON by design; hand the schema in
    # so the test exercises the normalise stage's null handling alone
    schema = pgs.infer_json_schema(
        df.where(F.col("row_id") < 90000), "payload",
        pgs.InferenceConfig(avro=True),
    ).schema
    a = (
        pgs.normalise_json(
            df.repartition(16), "payload", output_col="norm",
            avro_schema=schema,
        )
        .where(F.col("row_id") > 90000)
        .select("row_id", "norm")
        .collect()
    )
    assert sorted((r.row_id, r.norm) for r in a) == [
        (90001, None),
        (90002, None),
        (90003, None),
    ]


def test_infer_cell_cache_replication_invariant(spark):
    df = _replicated_docs(spark, n_distinct=25, copies=500)
    rep = pgs.infer_json_schema(df.repartition(16), "payload")
    one = pgs.infer_json_schema(
        df.select("payload").distinct().coalesce(1), "payload"
    )
    assert rep.schema == one.schema
    assert rep.processed_count == 25 * 500
    assert one.processed_count == 25


def test_infer_cell_cache_error_index_first_occurrence(spark):
    # an invalid cell must still raise, with the strict-mode error
    # carrying its first-occurrence index semantics
    rows = [(i, json.dumps({"k": i % 3})) for i in range(50)]
    rows.append((50, "{broken"))
    df = spark.createDataFrame(rows, "row_id long, payload string")
    from polars_genson_spark.operators.infer import SchemaInferenceError

    with pytest.raises(Exception) as ei:
        pgs.infer_json_schema(df.coalesce(1), "payload")
    assert "Invalid JSON" in str(ei.value)
