"""Per-partition pass/fail verdicts + violation-row assembly — the
generalisation of the reference's merge-then-validate shape (SURVEY.md §0)
from JSON columns to the pre-tokenized corpus table.

"Partition" here is the table partition key (``source`` — the Iceberg
identity partition in the target layout), so verdicts line up with the
physical layout a 1000-executor cluster would prune on.

One wide-agg pass computes stats + HLL uniqueness per source; violations
are narrow filters (consistency), a broadcast anti-join (referential), and
one opt-in wide groupBy (exact duplicates). Drift runs on the KB-sized
histogram rollup. Everything else is metadata-sized.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ValidationConfig
from .checks import (
    consistency_violations,
    drift_from_histogram,
    duplicate_rows,
    referential_violations,
)
from .stats import token_id_histogram, token_length_histogram


@dataclass
class ValidationReport:
    verdicts: DataFrame
    violations: DataFrame
    drift: list[dict]
    summary: dict[str, Any] = field(default_factory=dict)

    def passed(self) -> bool:
        return bool(self.summary.get("all_passed"))


def _violation_frame(
    df: DataFrame, check: str, cfg: ValidationConfig
) -> DataFrame:
    """Normalise a violation source frame to (check, doc_id, source, reason)."""
    cols = df.columns
    reason = F.col("reason") if "reason" in cols else F.lit(check)
    return df.select(
        F.lit(check).alias("check"),
        F.col(cfg.doc_id_col).alias("doc_id"),
        (F.col(cfg.source_col) if cfg.source_col in cols else F.lit(None)).alias(
            "source"
        ),
        reason.alias("reason"),
    )


def validate_corpus(
    df: DataFrame,
    allowed_sources: DataFrame | None = None,
    cfg: ValidationConfig | None = None,
    exact_duplicates: bool = True,
) -> ValidationReport:
    """Run the full validation suite; returns per-source verdicts plus the
    violation rows (lazily evaluated DataFrames)."""
    cfg = cfg or ValidationConfig()
    spark = df.sparkSession
    c = F.col
    src = cfg.source_col

    # ---- single-pass stats + HLL uniqueness (one shuffle, map-combined) ----
    base = df.groupBy(src).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(c(cfg.doc_id_col).isNull().cast("long")).alias("null_doc_id"),
        F.sum(c(cfg.tokens_col).isNull().cast("long")).alias("null_tokens"),
        F.sum(c(cfg.n_tok_col).isNull().cast("long")).alias("null_n_tok"),
        F.min(cfg.n_tok_col).alias("min_n_tok"),
        F.max(cfg.n_tok_col).alias("max_n_tok"),
        F.round(F.avg(cfg.n_tok_col), 4).alias("avg_n_tok"),
        F.approx_count_distinct(cfg.doc_id_col, cfg.hll_rsd).alias(
            "approx_distinct"
        ),
        F.sum(
            (c(cfg.n_tok_col) != F.size(c(cfg.tokens_col))).cast("long")
        ).alias("n_tok_mismatch"),
    )

    violation_frames: list[DataFrame] = []

    # ---- consistency ----
    cons = consistency_violations(df, cfg)
    violation_frames.append(_violation_frame(cons, "consistency", cfg))
    cons_counts = cons.groupBy(src).agg(
        F.count(F.lit(1)).alias("consistency_violations")
    )

    # ---- referential ----
    if allowed_sources is not None and cfg.check_referential:
        ref = referential_violations(df, allowed_sources, cfg)
        violation_frames.append(_violation_frame(ref, "referential", cfg))
        ref_counts = ref.groupBy(src).agg(
            F.count(F.lit(1)).alias("referential_violations")
        )
    else:
        ref_counts = None

    # ---- exact duplicates (the one wide shuffle; opt-in) ----
    if exact_duplicates and cfg.check_uniqueness:
        dups = duplicate_rows(df, cfg)
        dup_rows_per_source = (
            df.join(
                dups.select(cfg.doc_id_col, "dup_count"),
                cfg.doc_id_col,
                "inner",
            )
            .groupBy(src)
            .agg(F.count(F.lit(1)).alias("duplicate_rows"))
        )
        dup_viol = df.join(
            dups.select(cfg.doc_id_col), cfg.doc_id_col, "left_semi"
        )
        violation_frames.append(
            _violation_frame(
                dup_viol.withColumn("reason", F.lit("duplicate_doc_id")),
                "uniqueness",
                cfg,
            )
        )
    else:
        dup_rows_per_source = None

    # ---- drift (KB-sized rollup → driver) ----
    drift: list[dict] = []
    if cfg.check_drift:
        hist = token_id_histogram(df, cfg).collect()
        drift = drift_from_histogram((r.asDict() for r in hist), cfg)
    if drift:
        drift_df = spark.createDataFrame(
            [(d["source"], float(d["chi2"]), float(d["ks"]), bool(d["drifted"]))
             for d in drift],
            f"{src} string, chi2 double, ks double, drifted boolean",
        )
    else:
        drift_df = None

    # ---- assemble verdicts ----
    verdicts = base
    for extra in (cons_counts, ref_counts, dup_rows_per_source, drift_df):
        if extra is not None:
            verdicts = verdicts.join(F.broadcast(extra), src, "left")
    zero = F.lit(0)
    verdicts = verdicts.fillna(
        {
            "consistency_violations": 0,
            **({"referential_violations": 0} if ref_counts is not None else {}),
            **({"duplicate_rows": 0} if dup_rows_per_source is not None else {}),
        }
    )
    if drift_df is not None:
        verdicts = verdicts.fillna({"drifted": False, "chi2": 0.0, "ks": 0.0})

    pass_expr = c("consistency_violations") == zero
    if ref_counts is not None:
        pass_expr = pass_expr & (c("referential_violations") == zero)
    if dup_rows_per_source is not None:
        pass_expr = pass_expr & (c("duplicate_rows") == zero)
    if drift_df is not None:
        pass_expr = pass_expr & (~c("drifted"))
    verdicts = verdicts.withColumn("passed", pass_expr)

    violations = violation_frames[0]
    for vf in violation_frames[1:]:
        violations = violations.unionByName(vf)

    report = ValidationReport(
        verdicts=verdicts, violations=violations, drift=drift
    )
    return report


def finalise_summary(report: ValidationReport) -> dict[str, Any]:
    """Collect the (small) verdicts table and build the run summary."""
    rows = [r.asDict() for r in report.verdicts.collect()]
    all_passed = all(r["passed"] for r in rows)
    report.summary = {
        "partitions": len(rows),
        "all_passed": all_passed,
        "failed_partitions": sorted(
            r["source"] for r in rows if not r["passed"]
        ),
        "total_rows": sum(r["n_rows"] for r in rows),
        "per_partition": {r["source"]: r for r in rows},
    }
    return report.summary


def token_histograms(df: DataFrame, cfg: ValidationConfig | None = None):
    """Convenience: both histogram rollups (length + token-id)."""
    cfg = cfg or ValidationConfig()
    return token_length_histogram(df, cfg), token_id_histogram(df, cfg)
