"""Per-column / per-partition statistics — pure DataFrame aggregations.

Everything here is expressible as Catalyst aggregates (whole-stage codegen,
map-side partial aggregation), so the only shuffle is the tiny
per-(source, bucket) rollup. SURVEY.md §7.1 step 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ValidationConfig


def column_stats(df: DataFrame, cfg: ValidationConfig | None = None) -> DataFrame:
    """Per-source column stats: counts, null rates, n_tok min/max/mean,
    token totals. One row per source."""
    cfg = cfg or ValidationConfig()
    c = F.col
    return (
        df.groupBy(cfg.source_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(c(cfg.doc_id_col).isNull().cast("long")).alias("null_doc_id"),
            F.sum(c(cfg.tokens_col).isNull().cast("long")).alias("null_tokens"),
            F.sum(c(cfg.n_tok_col).isNull().cast("long")).alias("null_n_tok"),
            F.min(cfg.n_tok_col).alias("min_n_tok"),
            F.max(cfg.n_tok_col).alias("max_n_tok"),
            F.round(F.avg(cfg.n_tok_col), 4).alias("avg_n_tok"),
            F.sum(F.size(cfg.tokens_col).cast("long")).alias("total_tokens"),
        )
    )


def token_length_histogram(
    df: DataFrame, cfg: ValidationConfig | None = None
) -> DataFrame:
    """Histogram of sequence lengths per source: (source, bucket, cnt).

    bucket = floor(n_tok / bucket_width). Map-side combine keeps the
    shuffle at |sources| × |buckets| rows regardless of input size.
    """
    cfg = cfg or ValidationConfig()
    bucket = (F.col(cfg.n_tok_col) / cfg.token_hist_bucket).cast("long")
    return (
        df.where(F.col(cfg.n_tok_col).isNotNull())
        .groupBy(F.col(cfg.source_col), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def token_id_histogram(
    df: DataFrame, cfg: ValidationConfig | None = None
) -> DataFrame:
    """Histogram of token *values* per source for drift tests:
    (source, bucket, cnt) with bucket = token_id // (vocab/buckets).

    explode() looks expensive but Catalyst inserts a partial hash
    aggregate between the generator and the exchange, so the shuffle
    carries at most |sources| × token_id_buckets × partitions rows —
    independent of corpus size. This is the plan that survives 100 TB.
    """
    cfg = cfg or ValidationConfig()
    width = max(1, cfg.vocab_size // cfg.token_id_buckets)
    tok = F.explode(F.col(cfg.tokens_col)).alias("tok")
    exploded = df.select(F.col(cfg.source_col), tok)
    return (
        exploded.groupBy(
            cfg.source_col,
            (F.col("tok") / width).cast("long").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
