"""Per-stage scaling profile of the validate chain.

Times each corpus-sized pass of run_validation SEPARATELY at one core
count (pin externally with taskset + SPARK_GRAFT_CPUS), so a 4-core and
a 16-core run can be compared stage-by-stage and the non-scaling stage
identified instead of guessed.

    taskset -c 16-19 SPARK_GRAFT_CPUS=4  python tools_validate_profile.py .scale100m/tokens
    taskset -c 16-31 SPARK_GRAFT_CPUS=16 python tools_validate_profile.py .scale100m/tokens

Stages (mirrors jobs.run_validation / verdicts.validate_corpus):
  fingerprints  — per-source xxhash64 content fingerprint (resume scan)
  base_stats    — stats + HLL one-pass groupBy(source)
  row_viol      — consistency + referential scan (violation rows count)
  duplicates    — groupBy(doc_id) wide shuffle, dup rows count
  drift_hist    — token-id histogram (explode all token arrays)
  full_job      — run_validation end-to-end (writes included), the
                  number the scaling series measures
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from polars_genson_spark import checkpoint as ckpt
from polars_genson_spark.config import ValidationConfig
from polars_genson_spark.jobs import run_validation
from polars_genson_spark.operators.stats import token_id_histogram
from polars_genson_spark.operators.checks import consistency_reason_expr
from polars_genson_spark.session import get_spark
from polars_genson_spark.sources.corpus import allowed_sources_df


def main() -> None:
    path = sys.argv[1]
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    os.environ.setdefault("SPARK_GRAFT_CONSOLE_PROGRESS", "false")
    spark = get_spark(
        app_name=f"pgs-profile-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 8,
    )
    cfg = ValidationConfig()
    df = spark.read.parquet(path)
    allowed = allowed_sources_df(spark)
    out: dict[str, float] = {"cores": cores}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        out[name] = round(time.perf_counter() - t0, 1)
        print(f"{name}: {out[name]}s", flush=True)

    timed("fingerprints", lambda: ckpt.partition_fingerprints(df, cfg))

    timed(
        "base_stats",
        lambda: df.groupBy(cfg.source_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(cfg.doc_id_col).isNull().cast("long")).alias("nd"),
            F.min(cfg.n_tok_col).alias("mn"),
            F.max(cfg.n_tok_col).alias("mx"),
            F.round(F.avg(cfg.n_tok_col), 4).alias("av"),
            F.approx_count_distinct(cfg.doc_id_col, cfg.hll_rsd).alias("ad"),
            F.sum(
                (F.col(cfg.n_tok_col) != F.size(F.col(cfg.tokens_col))).cast(
                    "long"
                )
            ).alias("mm"),
        )
        .collect(),
    )

    reason = consistency_reason_expr(cfg)
    marker = allowed.select(
        F.col(cfg.source_col), F.lit(True).alias("_ok")
    ).dropDuplicates([cfg.source_col])
    timed(
        "row_viol",
        lambda: df.join(F.broadcast(marker), cfg.source_col, "left")
        .where(reason.isNotNull() | F.col("_ok").isNull())
        .count(),
    )

    timed(
        "duplicates",
        lambda: df.groupBy(cfg.doc_id_col)
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.collect_list(cfg.source_col).alias("s"),
        )
        .where(F.col("c") > 1)
        .count(),
    )

    timed("drift_hist", lambda: token_id_histogram(df, cfg).collect())

    import shutil

    run_dir = os.path.join(os.path.dirname(path.rstrip("/")), f"_profile_{cores}")
    shutil.rmtree(run_dir, ignore_errors=True)
    timed(
        "full_job",
        lambda: run_validation(spark, df, allowed, run_dir, cfg, resume=False),
    )
    shutil.rmtree(run_dir, ignore_errors=True)

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
