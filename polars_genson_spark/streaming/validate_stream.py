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


def _stats_aggs(cfg: ValidationConfig) -> list:
    """The ONE per-source stats aggregate list, shared by the plain and
    windowed streaming stats (a copy-pasted block once dropped
    ``cfg.hll_rsd``, so streaming approx_distinct silently disagreed with
    the batch path's configured precision)."""
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(cfg.doc_id_col, cfg.hll_rsd).alias(
            "approx_distinct"
        ),
        F.sum(
            (F.col(cfg.n_tok_col) != F.size(F.col(cfg.tokens_col)))
            .cast("long")
        ).alias("n_tok_mismatch"),
    ]


def stream_source_stats(
    stream: DataFrame, cfg: ValidationConfig | None = None
) -> DataFrame:
    cfg = cfg or ValidationConfig()
    return stream.groupBy(cfg.source_col).agg(*_stats_aggs(cfg))


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
        .agg(*_stats_aggs(cfg))
    )


def stream_running_verdicts(
    stream: DataFrame, cfg: ValidationConfig | None = None
) -> DataFrame:
    """Custom stateful operator: per-source running verdict via
    ``applyInPandasWithState``.

    The violation predicate is evaluated JVM-side BEFORE the stateful op,
    via the SAME ``consistency_reason_expr`` chain as the batch path — an
    earlier version re-derived the checks in pandas inside ``update`` and
    missed token_out_of_range and the seq-length bounds, exactly the
    batch/stream divergence the shared chain exists to prevent (and the
    third time a hand copy of that chain drifted). The stateful update
    only folds counts: State = (rows_total, violations_total, batches).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.checks import consistency_reason_expr

    cfg = cfg or ValidationConfig()
    marked = stream.withColumn(
        "_viol", consistency_reason_expr(cfg).isNotNull()
    )

    out_schema = (
        "source string, rows_total long, violations_total long, "
        "batches long, passed boolean"
    )
    state_schema = "rows_total long, violations_total long, batches long"

    def update(key, pdfs, state):
        rows = viol = 0
        for pdf in pdfs:
            rows += len(pdf)
            viol += int(pdf["_viol"].sum())
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

    return marked.groupBy(cfg.source_col).applyInPandasWithState(
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
    """foreachBatch incremental validation. Returns the StreamingQuery.

    With ``on_batch`` given, each micro-batch is handed to it as
    (batch_df, batch_id) — e.g. to run the full batch validator and merge
    verdicts into a manifest. WITHOUT ``on_batch``, the default path runs
    the narrow checks itself: per-source consistency-violation counts
    (the shared batch reason chain) plus, when ``allowed`` is given, the
    broadcast referential check — and appends the per-batch verdict
    rollup to ``<checkpoint_dir>/batch_verdicts`` (parquet, any URI
    scheme). An earlier version silently dropped ``allowed``/``cfg`` and
    with on_batch=None validated nothing while still committing the
    stream checkpoint — files were marked processed unchecked."""
    cfg = cfg or ValidationConfig()
    stream = read_corpus_stream(spark, input_dir)
    verdicts_path = checkpoint_dir.rstrip("/") + "/batch_verdicts"

    def default_on_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.checks import consistency_reason_expr

        src = cfg.source_col
        marked = batch_df.withColumn(
            "_cons", consistency_reason_expr(cfg).isNotNull().cast("long")
        )
        if allowed is not None:
            marker = allowed.select(
                F.col(src), F.lit(True).alias("_ok")
            ).dropDuplicates([src])
            marked = marked.join(F.broadcast(marker), src, "left")
            ref_col = F.sum(F.col("_ok").isNull().cast("long"))
        else:
            ref_col = F.lit(0)
        (
            marked.groupBy(src)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("_cons").alias("consistency_violations"),
                ref_col.alias("referential_violations"),
            )
            .withColumn(
                "passed",
                (F.col("consistency_violations") == 0)
                & (F.col("referential_violations") == 0),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(verdicts_path)
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if on_batch is not None:
            on_batch(batch_df, batch_id)
        else:
            default_on_batch(batch_df, batch_id)

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
    ``operators.relational.sessionize``. NOT byte-identical semantics:
    session_window's close is ``last_event + gap`` EXCLUSIVE, so an
    event exactly ``gap`` later starts a NEW session here but continues
    the session in the batch operator (strict ``>`` test), and
    session_end is ``last_event + gap`` here vs ``max(ts)`` there —
    reconcile accordingly when comparing backfill to stream.

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
            # nulls count toward the total ONLY (like out-of-range
            # lengths): fillna(0) would pile them into bucket 0 — a real,
            # normally-populated reference bucket — moving psi in a
            # direction unrelated to the corruption
            bs = (pdf[n_c].dropna() // width).astype(int)
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
