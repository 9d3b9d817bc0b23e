"""Bucketed-table IO: pre-shuffle once at write time so every later
join/aggregation on the bucket key runs exchange-free.

At 100 TB the dominant cost of a key-repeated workload (dedup joins,
per-doc feature joins, validation join-backs) is re-shuffling the fact
table for every query. Hive-style bucketing (``DataFrameWriter.bucketBy``)
materialises the hash-partitioning into the table layout: when both join
sides are bucketed by the join key with compatible bucket counts, Spark
plans a SortMergeJoin with NO Exchange on either side — the shuffle was
paid once, at write time. ``sortBy`` within buckets additionally drops the
per-task Sort when bucketed-scan sort info is enabled.

The reference engine is single-node and has no equivalent; this module is
the Spark-native answer to its repeated full-corpus passes
(polars-genson-py ``infer_from_parquet`` re-reads the file per call —
see reference python/polars_genson/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    num_buckets: int,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed managed table.

    ``num_buckets`` should be sized so one bucket of the LARGEST future
    reader fits in an executor core's memory slice — at 100 TB with 512 MB
    target splits that is ~200k buckets, far above the 32 used in tests;
    the mechanism is identical, only the constant changes.
    """
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(num_buckets, cols[0], *cols[1:])
    )
    if sort_by is not None:
        s = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(s[0], *s[1:])
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key.

    When both tables were written by :func:`write_bucketed` with the same
    key and compatible bucket counts (equal, or one a multiple of the
    other with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``),
    the physical plan contains no Exchange — assert it with
    :func:`plan_exchange_count` in tests/monitoring.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (the
    thing bucketing exists to eliminate). Broadcast exchanges are not
    counted — they are the cheap kind."""
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
