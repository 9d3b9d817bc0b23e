"""Round-4 fourth review pass: relational / incremental / sources
findings — non-string group columns, numeric window ordering, working-
column collisions, map-payload as-of joins, quantile quoting, benchmark
layout bounds, explicit catalog routing, and the max-length boundary in
the synthetic corpus.
"""

from __future__ import annotations

import pytest

from polars_genson_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(
        app_name="pgs-tests-r4r4", master="local[4]", shuffle_partitions=4
    )


def test_by_group_non_string_group_column(spark):
    """A long (or any non-string) group column must work: the schema was
    hard-coded 'group string' and crashed Arrow conversion."""
    import json

    from polars_genson_spark.operators.incremental import (
        infer_json_schema_by_group,
    )

    rows = [
        (1, '{"a": 1}'),
        (1, '{"a": 2, "b": "x"}'),
        (2, '{"c": true}'),
    ]
    df = spark.createDataFrame(rows, "shard long, doc string")
    out = {
        r["shard"]: json.loads(r["schema_json"])
        for r in infer_json_schema_by_group(df, "doc", "shard").collect()
    }
    assert set(out) == {1, 2}
    assert set(out[1]["properties"]) == {"a", "b"}
    assert set(out[2]["properties"]) == {"c"}


def test_schema_drift_numeric_window_order(spark):
    """Windows '9' and '10' must diff in numeric order: lexicographic
    sort diffed 9 against 10 backwards."""
    from polars_genson_spark.operators.incremental import schema_drift

    rows = (
        [("8", '{"a": 1}')] * 2
        + [("9", '{"a": 1, "b": "x"}')] * 2
        + [("10", '{"a": 1, "b": "x", "c": true}')] * 2
    )
    df = spark.createDataFrame(rows, "w string, doc string")
    out = {r["window"]: r.asDict() for r in schema_drift(df, "doc", "w").collect()}
    # 9 gains b vs 8; 10 gains c vs 9 — the backwards order would have
    # reported 9 as REMOVING c
    assert out["9"]["added"] == ["b"] and out["9"]["removed"] == []
    assert out["10"]["added"] == ["c"] and out["10"]["removed"] == []


def test_asof_join_map_payload(spark):
    """A map-typed right payload column must ride along (maps cannot be
    sorted; the old payload-struct ORDER BY threw AnalysisException)."""
    from polars_genson_spark.operators.relational import asof_join

    trades = spark.createDataFrame(
        [("A", 10), ("A", 20)], "sym string, ts long"
    )
    quotes = spark.createDataFrame(
        [("A", 5, 1.0, {"venue": "X"}), ("A", 15, 2.0, {"venue": "Y"})],
        "sym string, ts long, px double, meta map<string,string>",
    )
    out = {r["ts"]: r.asDict() for r in
           asof_join(trades, quotes, on="sym").collect()}
    assert out[10]["asof_px"] == 1.0 and out[10]["asof_meta"] == {"venue": "X"}
    assert out[20]["asof_px"] == 2.0 and out[20]["asof_meta"] == {"venue": "Y"}


def test_working_column_collisions_fail_loud(spark):
    """Inputs carrying internal working/output names must raise, not be
    silently overwritten or dropped."""
    from polars_genson_spark.operators.relational import (
        asof_join,
        range_join,
        sessionize,
    )

    l_bad = spark.createDataFrame([("A", 1, 9)], "k string, ts long, _match long")
    r_ok = spark.createDataFrame([("A", 1, 2.0)], "k string, ts long, px double")
    with pytest.raises(ValueError, match="_match"):
        asof_join(l_bad, r_ok, on="k")

    s_bad = spark.createDataFrame(
        [("u", 1, 5)], "user_id string, ts long, session_id long"
    )
    with pytest.raises(ValueError, match="session_id"):
        sessionize(s_bad)

    rl = spark.createDataFrame([(1.0, 7)], "x double, _bucket long")
    rr = spark.createDataFrame([(2.0,)], "y double")
    with pytest.raises(ValueError, match="_bucket"):
        range_join(rl, rr, "x", "y", 0.0, 5.0)


def test_grouped_quantiles_awkward_column_name(spark):
    """Column names with spaces must be quoted into the percentile expr
    (unquoted they fail to parse — or worse, parse as something else)."""
    from polars_genson_spark.operators.relational import grouped_quantiles

    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 12)], ["grp", "n tok"]
    )
    out = grouped_quantiles(df, "grp", "n tok", [0.5]).collect()
    assert out[0]["q0_5"] == 6.0


def test_generate_benchmark_bounds():
    """n_bench larger than the corpus unique region must raise — the
    copies would target nonexistent docs and the decontamination
    accounting would silently under-drop."""
    from polars_genson_spark.sources.scale_docs import (
        default_layout,
        generate_benchmark,
    )

    lay = default_layout(500)
    with pytest.raises(ValueError, match="unique region"):
        generate_benchmark(None, lay, n_bench=500)


def test_catalog_routing_is_explicit():
    """Bare names are paths even when Iceberg is available; dotted
    identifiers and iceberg:-prefixed names route to the catalog."""
    from polars_genson_spark.sources.catalog import _table_identifier

    assert _table_identifier("corpus_out") is None          # bare → path
    assert _table_identifier("out.parquet") is None
    assert _table_identifier("data/corpus") is None
    assert _table_identifier("db.table") == "db.table"
    assert _table_identifier("cat.db.table") == "cat.db.table"
    assert _table_identifier("iceberg:plain_name") == "plain_name"


def test_iceberg_prefix_without_runtime_raises(spark, tmp_path):
    """An explicit iceberg: target must never silently degrade to a
    local parquet path when the runtime jars are absent."""
    from polars_genson_spark.sources.catalog import (
        iceberg_available,
        read_corpus,
        write_corpus_table,
    )

    if iceberg_available(spark):  # pragma: no cover - jarred env
        pytest.skip("Iceberg runtime present; fallback path not reachable")
    df = spark.createDataFrame([("a", "web")], "doc_id string, source string")
    with pytest.raises(ValueError, match="Iceberg catalog"):
        write_corpus_table(df, "iceberg:corpus_tbl")
    with pytest.raises(ValueError, match="Iceberg catalog"):
        read_corpus(spark, "iceberg:corpus_tbl")


def test_corpus_reaches_max_token_length(spark):
    """The synthetic corpus must include the documented MAX_TOKENS
    boundary (the old (MAX-1) multiplier topped out one short, so
    max-length off-by-ones could never be caught)."""
    import pyspark.sql.functions as F

    from polars_genson_spark.sources.corpus import MAX_TOKENS, generate_corpus

    df = generate_corpus(spark, n_rows=50_000, seed=11)
    mx = df.agg(F.max(F.size("tokens")).alias("m")).collect()[0]["m"]
    assert mx == MAX_TOKENS
