"""Catalog-aware corpus IO: the Iceberg branch is real code behind a
capability probe, not a comment.

At the target layout the corpus is an Iceberg table identity-partitioned
by ``source`` (SURVEY.md §7.3 item 6): readers pin a branch/snapshot for
reproducible validation runs, writers tag runs via table properties. In
environments without the Iceberg runtime jars (this sandbox), every entry
point degrades cleanly to the partitioned-parquet layout that
``write_corpus`` produces — same schema, same partition pruning on
``source``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        jvm = spark._jvm  # noqa: SLF001 - capability probe needs the JVM
        jvm.java.lang.Class.forName(ICEBERG_CATALOG_CLASS)
        return True
    except Exception:
        return False


def _table_identifier(source: str) -> str | None:
    """Explicit, environment-independent routing. Returns the catalog
    identifier when ``source`` should go to Iceberg, else None (path).

    - ``iceberg:<ident>`` forces the catalog (callers strip the prefix);
      without the runtime the caller must RAISE, never fall back.
    - A dotted identifier with no path separators (``db.table``,
      ``catalog.db.table``) routes to the catalog when available.
    - ANYTHING else — including a bare name like ``corpus_out`` — is a
      path. The old substring heuristic classified bare names as tables
      whenever the Iceberg jars happened to be on the classpath, so the
      same call wrote a warehouse table in one environment and a local
      directory in another.
    """
    if source.startswith("iceberg:"):
        return source[len("iceberg:"):]
    if "/" in source or "\\" in source or source.endswith(".parquet"):
        return None
    return source if "." in source else None


def read_corpus(
    spark: SparkSession,
    source: str,
    branch: str | None = None,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read the corpus from an Iceberg table (``catalog.db.table``
    identifier or explicit ``iceberg:<name>``) or a parquet path.

    - Iceberg + ``branch``: time-travel to the named branch
      (``spark.read.option("branch", ...)``) so a validation run pins the
      exact table state it certifies.
    - Iceberg + ``snapshot_id``: pin a snapshot instead.
    - No Iceberg runtime, or ``source`` is a path: plain parquet read of
      the identity-partitioned layout; branch/snapshot selection is not
      available and raises rather than silently reading HEAD. An explicit
      ``iceberg:`` source also raises without the runtime — it must never
      silently degrade to a local path.
    """
    ident = _table_identifier(source)
    if ident is not None and source.startswith("iceberg:") and not iceberg_available(spark):
        raise ValueError(
            f"source {source!r} explicitly requests the Iceberg catalog "
            "but the runtime jars are not on the classpath"
        )
    if ident is not None and iceberg_available(spark):
        source = ident
        reader = spark.read
        if branch is not None:
            reader = reader.option("branch", branch)
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.table(source)
    if branch is not None or snapshot_id is not None:
        raise ValueError(
            "branch/snapshot selection requires the Iceberg runtime and a "
            f"table identifier; got source={source!r} with "
            f"iceberg_available={iceberg_available(spark)}"
        )
    return spark.read.parquet(source)


def write_corpus_table(
    df: DataFrame,
    target: str,
    run_properties: dict[str, str] | None = None,
    partition_col: str = "source",
) -> str:
    """Write the corpus to an Iceberg table with run-tagging TBLPROPERTIES,
    falling back to partitioned parquet without the runtime.

    Returns the layout actually used (``"iceberg"`` or ``"parquet"``) so
    callers and tests can assert the fallback path."""
    spark = df.sparkSession
    ident = _table_identifier(target)
    if ident is not None and target.startswith("iceberg:") and not iceberg_available(spark):
        raise ValueError(
            f"target {target!r} explicitly requests the Iceberg catalog "
            "but the runtime jars are not on the classpath"
        )
    if ident is not None and iceberg_available(spark):
        writer = (
            df.writeTo(ident)
            .using("iceberg")
            .partitionedBy(partition_col)
        )
        for k, v in (run_properties or {}).items():
            writer = writer.tableProperty(k, v)
        writer.createOrReplace()
        return "iceberg"
    df.write.mode("overwrite").partitionBy(partition_col).parquet(target)
    if run_properties:
        # parquet has no table properties; persist the run tags as the
        # sidecar the metadata reader already understands
        from .parquet_io import write_sidecar_metadata

        write_sidecar_metadata(target, run_properties)
    return "parquet"
