"""Structured Streaming validation: continuously validate corpus files as
they land.

The reference is pure batch (SURVEY.md §2.8) — this is the Spark-native
extension the target design calls for: the same checks re-expressed as a
streaming pipeline.

- ``stream_consistency_violations``: append-mode stream of violation rows
  (pure narrow filter — trivially streamable)
- ``stream_source_stats``: running per-source counters via update-mode
  aggregation
- ``stream_windowed_stats``: event-time windowed per-source stats with a
  watermark for late data
- ``stream_running_verdicts``: custom stateful operator via
  ``applyInPandasWithState`` — per-source running totals + pass/fail
  maintained across micro-batches (the Spark-native analogue of the
  engine's per-partition verdicts, kept incrementally)
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
    from ..operators.checks import consistency_reason_expr

    reason = consistency_reason_expr(cfg)  # SHARED with the batch path
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


def stream_windowed_stats(
    stream: DataFrame,
    event_time_col: str = "ingest_ts",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    cfg: ValidationConfig | None = None,
) -> DataFrame:
    """Event-time windowed per-source stats with late-data handling:
    rows later than ``watermark`` behind the max seen event time are
    dropped and their window state is reclaimed."""
    cfg = cfg or ValidationConfig()
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(
            F.window(F.col(event_time_col), window_duration),
            F.col(cfg.source_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.approx_count_distinct(cfg.doc_id_col).alias("approx_distinct"),
            F.sum(
                (F.col(cfg.n_tok_col) != F.size(F.col(cfg.tokens_col)))
                .cast("long")
            ).alias("n_tok_mismatch"),
        )
    )


def stream_running_verdicts(
    stream: DataFrame, cfg: ValidationConfig | None = None
) -> DataFrame:
    """Custom stateful operator: per-source running verdict via
    ``applyInPandasWithState``.

    State = (rows_total, violations_total, batches); each micro-batch
    folds its rows into the state with vectorized pandas ops (no per-row
    Python), and emits the updated running verdict row for the source.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    cfg = cfg or ValidationConfig()
    doc_c, tok_c, n_c = cfg.doc_id_col, cfg.tokens_col, cfg.n_tok_col

    out_schema = (
        "source string, rows_total long, violations_total long, "
        "batches long, passed boolean"
    )
    state_schema = "rows_total long, violations_total long, batches long"

    def update(key, pdfs, state):
        rows = viol = 0
        for pdf in pdfs:
            rows += len(pdf)
            sizes = pdf[tok_c].str.len()
            bad = (
                pdf[doc_c].isna()
                | pdf[tok_c].isna()
                | pdf[n_c].isna()
                | (sizes != pdf[n_c])
            )
            viol += int(bad.sum())
        if state.exists:
            r0, v0, b0 = state.get
        else:
            r0 = v0 = b0 = 0
        r, v, b = r0 + rows, v0 + viol, b0 + 1
        state.update((r, v, b))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "rows_total": [r],
                "violations_total": [v],
                "batches": [b],
                "passed": [v == 0],
            }
        )

    return stream.groupBy(cfg.source_col).applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
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


def stream_drop_duplicates(
    stream: DataFrame,
    event_time_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    cfg: ValidationConfig | None = None,
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival per doc_id.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state to the
    watermark horizon — the state store holds only ids seen within the
    last ``watermark`` of event time, so the operator runs forever on an
    unbounded stream (a plain dropDuplicates would grow state without
    bound). Duplicates arriving later than the watermark pass through —
    the batch dedup sweep (operators/dedup.py) is the backstop, which is
    exactly the lambda-style split the 100 TB pipeline wants: cheap
    in-stream dedup for the hot window, exact batch dedup at rest."""
    cfg = cfg or ValidationConfig()
    return stream.withWatermark(
        event_time_col, watermark
    ).dropDuplicatesWithinWatermark([cfg.doc_id_col])


def stream_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    event_time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessions via Spark's native
    ``session_window`` — the streaming twin of
    ``operators.relational.sessionize`` (same semantics: a session
    closes after ``gap`` of user inactivity).

    State is per-(user, open session) and is reclaimed once the
    watermark passes the session close — bounded by active users, not
    history. Output mode must be append; a session row emits when it
    can no longer grow."""
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(
            F.session_window(F.col(event_time_col), gap),
            F.col(user_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_psi_drift(
    stream: DataFrame,
    reference_hist: dict[int, float],
    cfg: ValidationConfig | None = None,
    psi_threshold: float = 0.2,
) -> DataFrame:
    """Custom stateful operator: per-source RUNNING population-stability
    index of the sequence-length distribution against a static reference
    histogram — the streaming face of the batch PSI drift check
    (operators/checks.py): a source whose length mix shifts away from
    the reference (e.g. a scraper change mid-ingest) flips ``drifted``
    without waiting for a batch job.

    State = the source's cumulative per-bucket counts (a dict-sized
    vector, KB per source); each micro-batch folds its rows in with
    vectorized pandas, then PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over the
    reference buckets with the SAME smoothing as the batch
    implementation (checks.py psi_drift): p floored at ε, q used raw
    (reference fractions are nonzero by construction; a zero is still
    ε-floored to avoid log-div-zero), so a psi_threshold tuned on batch
    output fires at the same point here.
    ``reference_hist``: {bucket → fraction}, bucket = n_tok //
    cfg.token_hist_bucket — produce it from a trusted corpus slice with
    the batch histogram operator and broadcast it here (KB-sized).
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    cfg = cfg or ValidationConfig()
    n_c = cfg.n_tok_col
    width = cfg.token_hist_bucket
    buckets = sorted(reference_hist)
    eps = 1e-6

    out_schema = (
        "source string, rows_total long, psi double, drifted boolean"
    )
    state_schema = "counts array<long>, rows_total long"

    def update(key, pdfs, state):
        if state.exists:
            counts, total = state.get
            counts = list(counts)
        else:
            counts, total = [0] * len(buckets), 0
        idx = {b: i for i, b in enumerate(buckets)}
        for pdf in pdfs:
            bs = (pdf[n_c].fillna(0) // width).astype(int)
            total += len(pdf)
            for b, c in bs.value_counts().items():
                i = idx.get(int(b))
                if i is not None:
                    counts[i] += int(c)
                # lengths outside every reference bucket still count
                # toward the total, starving the known buckets' p — an
                # out-of-range shift therefore RAISES psi, not hides
        psi = 0.0
        if total > 0:
            for i, b in enumerate(buckets):
                p = max(counts[i] / total, eps)
                q = max(reference_hist[b], eps)
                psi += (p - q) * math.log(p / q)
        state.update((counts, total))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "rows_total": [total],
                "psi": [round(psi, 6)],
                "drifted": [psi > psi_threshold],
            }
        )

    return stream.groupBy(cfg.source_col).applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
