"""The corpus validation engine over the deterministic synthetic corpus
(FIXTURES.md F0): planted violations must be found exactly — no more, no
less — and verdicts must flag exactly the planted bad partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_genson_spark.config import ValidationConfig
from polars_genson_spark.operators.checks import (
    bloom_prefilter,
    consistency_violations,
    duplicate_rows,
    referential_violations,
    uniqueness_summary,
)
from polars_genson_spark.operators.stats import (
    column_stats,
    token_length_histogram,
)
from polars_genson_spark.operators.verdicts import (
    finalise_summary,
    validate_corpus,
)
from polars_genson_spark.sources.corpus import (
    DRIFTED_SOURCE,
    allowed_sources_df,
    generate_corpus,
)

N = 30_000


@pytest.fixture(scope="module")
def corpus(spark):
    df = generate_corpus(spark, N, seed=42).persist()
    df.count()
    yield df
    df.unpersist()


def test_schema_shape(corpus):
    fields = {f.name: f.dataType.simpleString() for f in corpus.schema.fields}
    assert fields == {
        "doc_id": "string",
        "tokens": "array<int>",
        "n_tok": "int",
        "source": "string",
    }


def test_determinism(spark, corpus):
    again = generate_corpus(spark, N, seed=42)
    assert again.exceptAll(corpus).count() == 0
    assert corpus.exceptAll(again).count() == 0


def test_planted_consistency_violations(corpus):
    cons = consistency_violations(corpus).collect()
    reasons = {r["reason"] for r in cons}
    assert "n_tok_mismatch" in reasons
    # mismatches planted at ~1/10k over 30k rows → a handful, not thousands
    assert 0 < len(cons) < 50


def test_planted_duplicates(corpus):
    dups = duplicate_rows(corpus).collect()
    assert 0 < len(dups) < 30
    assert all(r["dup_count"] >= 2 for r in dups)


def test_referential_unknown_only(spark, corpus):
    allowed = allowed_sources_df(spark)
    viol = referential_violations(corpus, allowed)
    srcs = {r["source"] for r in viol.select("source").distinct().collect()}
    assert srcs == {"UNKNOWN"}
    n_unknown = corpus.where(F.col("source") == "UNKNOWN").count()
    assert viol.count() == n_unknown > 0


def test_bloom_prefilter_superset(spark, corpus):
    allowed = allowed_sources_df(spark)
    pre = bloom_prefilter(corpus, "source", allowed, fpp=0.001)
    exact = referential_violations(corpus, allowed)
    # prefilter output ⊆ exact violations is NOT guaranteed (fp drop side),
    # but every prefilter survivor must be a true violation after anti-join
    chased = referential_violations(pre, allowed)
    assert chased.count() <= exact.count()
    # and with tiny fpp the prefilter alone should already be exact here
    assert pre.count() == exact.count()


def test_stats_and_histogram(corpus):
    stats = {r["source"]: r.asDict() for r in column_stats(corpus).collect()}
    assert stats["web-01"]["n_rows"] > 0.4 * N  # planted skew
    for s, row in stats.items():
        assert row["min_n_tok"] is None or row["min_n_tok"] >= 1
        assert row["max_n_tok"] is None or row["max_n_tok"] <= 513
    hist = token_length_histogram(corpus).collect()
    assert sum(r["cnt"] for r in hist) == corpus.where(
        F.col("n_tok").isNotNull()
    ).count()


def test_uniqueness_summary_hll_close(corpus):
    rows = uniqueness_summary(corpus).collect()
    for r in rows:
        # HLL estimate within 3*rsd of the row count
        assert abs(r["approx_distinct"] - r["n_rows"]) <= max(
            10, 0.06 * r["n_rows"]
        )


def test_full_validation_verdicts(spark, corpus):
    allowed = allowed_sources_df(spark)
    report = validate_corpus(corpus, allowed)
    summary = finalise_summary(report)

    per = summary["per_partition"]
    # UNKNOWN partition fails referential
    assert per["UNKNOWN"]["referential_violations"] == per["UNKNOWN"]["n_rows"]
    assert per["UNKNOWN"]["passed"] is False
    # the drifted source is flagged, and only it
    drifted = {d["source"] for d in report.drift if d["drifted"]}
    assert DRIFTED_SOURCE in drifted
    assert drifted == {DRIFTED_SOURCE}
    # violation rows: every check represented
    checks = {
        r["check"]
        for r in report.violations.select("check").distinct().collect()
    }
    assert checks == {"consistency", "referential", "uniqueness"}
    assert summary["all_passed"] is False
    assert summary["total_rows"] == N


def test_clean_corpus_passes(spark):
    """Strip planted violations → every partition passes."""
    allowed = allowed_sources_df(spark)
    df = generate_corpus(spark, 5_000, seed=7)
    clean = (
        df.where(F.col("source") != "UNKNOWN")
        .where(F.col("source") != DRIFTED_SOURCE)
        .where(F.col("n_tok").isNotNull())
        .where(F.col("n_tok") == F.size("tokens"))
        .dropDuplicates(["doc_id"])
    )
    report = validate_corpus(clean, allowed)
    summary = finalise_summary(report)
    assert summary["all_passed"] is True
    assert report.violations.count() == 0


def test_validation_invariant_to_partition_layout(spark):
    """Verdicts and violation rows must be identical regardless of how the
    input is partitioned — the engine-level merge-order-determinism
    guarantee (SURVEY §7.3-1 generalised from schema merge to checks)."""
    cfg = ValidationConfig()
    allowed = allowed_sources_df(spark)
    base = generate_corpus(spark, 30000, seed=9)

    def run(df):
        report = validate_corpus(df, allowed, cfg)
        verdicts = sorted(
            tuple(r) for r in report.verdicts.drop("approx_distinct").collect()
        )
        violations = sorted(tuple(r) for r in report.violations.collect())
        report.verdicts.unpersist()
        report.violations.unpersist()
        return verdicts, violations

    v1 = run(base.repartition(3))
    v2 = run(base.repartition(17, "source"))
    v3 = run(base.coalesce(1))
    assert v1 == v2 == v3
