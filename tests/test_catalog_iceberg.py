"""Live-Iceberg exercise of sources/catalog.py.

The fallback (no-jars) path is covered by
test_parquet_io_per_row.test_catalog_fallback_without_iceberg. This module
executes the OTHER branch — real Iceberg table write/read with branch and
snapshot pinning — whenever the Iceberg Spark runtime is on the
classpath, and skips with an explicit reason otherwise, so the
branch/snapshot claims in catalog.py have at least one executed path in
any environment that carries the jars (this sandbox does not).
"""

from __future__ import annotations

import pytest

from polars_genson_spark.sources.catalog import (
    iceberg_available,
    read_corpus,
    write_corpus_table,
)


@pytest.fixture(scope="module")
def iceberg_spark(spark, tmp_path_factory):
    """A session with a local Iceberg hadoop catalog, or a skip."""
    if not iceberg_available(spark):
        pytest.skip(
            "Iceberg Spark runtime jars not on the JVM classpath "
            "(org.apache.iceberg.spark.SparkCatalog not loadable) — "
            "live catalog path not executable in this environment; "
            "fallback path is covered by "
            "test_catalog_fallback_without_iceberg"
        )
    warehouse = str(tmp_path_factory.mktemp("iceberg_wh"))
    # spark.sql.catalog.* are runtime-settable SQL confs (Iceberg
    # initialises catalogs lazily), so configure the shared session
    # in-place instead of stopping/recreating it under other tests
    spark.conf.set(
        "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set("spark.sql.catalog.local.warehouse", warehouse)
    yield spark


def test_iceberg_write_read_roundtrip(iceberg_spark):
    df = iceberg_spark.createDataFrame(
        [("d1", [1, 2], 2, "web"), ("d2", [3], 1, "wiki")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    layout = write_corpus_table(
        df, "local.db.corpus", run_properties={"run": "r3-test"}
    )
    assert layout == "iceberg"
    back = read_corpus(iceberg_spark, "local.db.corpus")
    assert back.count() == 2
    assert sorted(back.columns) == ["doc_id", "n_tok", "source", "tokens"]


def test_iceberg_snapshot_pinning(iceberg_spark):
    df1 = iceberg_spark.createDataFrame(
        [("d1", [1], 1, "web")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    write_corpus_table(df1, "local.db.snap")
    snap = (
        iceberg_spark.sql("SELECT snapshot_id FROM local.db.snap.snapshots")
        .collect()[0]["snapshot_id"]
    )
    df2 = df1.unionByName(df1)
    df2.writeTo("local.db.snap").append()
    head = read_corpus(iceberg_spark, "local.db.snap")
    pinned = read_corpus(iceberg_spark, "local.db.snap", snapshot_id=snap)
    assert head.count() == 3
    assert pinned.count() == 1  # time travel to the pre-append snapshot
