"""SparkSession factory with engine defaults (AQE, Arrow, sane shuffle)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "polars-genson-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(master.split("[")[1].rstrip("]*")) if "[" in master else 32
        except ValueError:
            shuffle_partitions = 32
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Joins (optimization guide §3.1/§9): allow shuffled-hash when a
        # side fits per-partition (sort-merge's sorts are pure overhead
        # then), and let AQE rewrite SMJ->SHJ from runtime sizes.
        # Measured A/B at sf1.0 (OPTIMIZATION_r06.md): SHJ is neutral on
        # q5 and ~12% faster on q3. Raising autoBroadcastJoinThreshold
        # to 64m was ALSO tried and rejected: BroadcastExchange builds
        # the hash relation single-threaded on the driver, so q5/q3
        # regressed 3x (3.7->11.1s / 1.6->6.6s) when the 1.5M-row
        # orders side became a broadcast — the default 10m stays.
        # Env-overridable, size-based (not core-count-based), so the
        # setting translates to a cluster unchanged.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCAL_MAP_THRESHOLD", "64m"),
        )
        # ANSI mode (Spark 4 default: on) adds per-row overflow/cast
        # check branches to every codegen'd arithmetic expression AND
        # makes any sum() over full-range int64 values (e.g. xxhash64
        # rollups, which this engine uses for dedup/fingerprint/verify
        # surfaces) throw ARITHMETIC_OVERFLOW instead of wrapping: a
        # random-walk sum of n uniform 64-bit hashes overflows with
        # near-certainty even for small n. Measured at sf1.0/32 cores:
        # a 14-query slice of the bench suite dropped 19.8s -> 10.3s
        # because every multi-row-output query's xxhash64-checksum
        # materialisation stopped failing over to a second full
        # execution. Pre-4.0 Spark default; results verified identical
        # (87/87 oracle hashdiff, full pytest) with ANSI off.
        .config(
            "spark.sql.ansi.enabled",
            os.environ.get("SPARK_GRAFT_ANSI", "false"),
        )
        .config("spark.ui.enabled", "false")
        # scale runners set this to "false": progress bars bloat captured
        # logs ~100x and can push the final JSON line past tail windows
        .config(
            "spark.ui.showConsoleProgress",
            os.environ.get("SPARK_GRAFT_CONSOLE_PROGRESS", "true"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # managed (bucketed) tables land outside the repo unless the
        # caller points the warehouse somewhere durable
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/pgs-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
