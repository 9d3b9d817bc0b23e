"""Round-5 third-window pins: the relational breadth pack's plan-shape
invariants, the broadcast-hint scale rule, and the split-leakage check's
non-vacuity.

Value parity for all eight new queries is covered by
tests/test_entry_oracle.py + tools_hashdiff.py; these tests pin the
properties the oracle hash CANNOT see — physical plan shape and the
source-level hint discipline."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as E

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_q2_argmin_single_fact_scan(spark):
    """The window-min rewrite must keep exactly ONE lineitem scan (the
    rollup⋈rollup join-back it replaced scanned the fact table twice —
    the rollup key != join key blocks exchange reuse). An SMJ may still
    appear in the INITIAL plan for the un-hinted supplier-filter join;
    that is the correct scale fallback, not the flaw this test pins."""
    df = E.queries()["q2_min_cost_supplier"](spark, SF001)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("Window") == 1


def test_no_pinned_broadcast_on_sf_scaled_tables():
    """Hint discipline (PLANS.md §Round-5 cont.): pinned F.broadcast()
    is allowed only on fixed-cardinality dims (nation/region) and on
    1-row/rollup-sized frames. part/supplier/customer/orders/lineitem
    all scale with SF — a pinned broadcast there OOMs at 1000× even
    though AQE would happily broadcast at bench SF. This test greps the
    entry module source for broadcasts whose argument expression names
    an SF-scaled table variable pattern."""
    src = open(E.__file__).read()
    banned = re.findall(
        r'F\.broadcast\(\s*_t\([^)]*,\s*"'
        r'(part|supplier|customer|orders|lineitem|documents|embeddings)"',
        src,
    )
    assert banned == [], f"pinned broadcast on SF-scaled table(s): {banned}"
    # the variable-name forms the audit removed must not come back
    for pat in (
        r"F\.broadcast\(part\)",
        r"F\.broadcast\(p\)",
        r"F\.broadcast\(s\)[^n]",  # F.broadcast(s) but not broadcast(sn)
        r"F\.broadcast\(c\)",
        r"F\.broadcast\(o\)",
        r"F\.broadcast\(li\)",
    ):
        hits = re.findall(pat, src)
        assert hits == [], f"pinned broadcast regressed: {pat} -> {hits}"


def test_split_leakage_non_vacuous_and_planted_rate(spark):
    """The leakage check must actually produce leakage on the synthetic
    corpus (the corpus itself has no exact dupes, so the query plants
    every-97th-doc re-entries): at sf0.01 6 docs are planted and each
    crosses splits independently with p ≈ 0.34 — assert >0 rows and
    every row straddles >1 split with a consistent splits string."""
    rows = E.queries()["split_leakage_docs"](spark, SF01).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_splits > 1
        assert len(r.splits.split(",")) == r.n_splits
        assert r.n_docs >= 2


def test_q10_revenue_is_exact_decimal(spark):
    """q10's money arithmetic must round-trip through decimal, not
    float: a planted half-cent case (price 10.01, discount 0.50 →
    5.005) must round HALF_UP to 5.01 — the float path rounds the
    binary double 5.004999... down to 5.00 in at least one engine."""
    from pyspark.sql import functions as F

    exact = (
        F.round(
            F.sum(
                F.col("price").cast("decimal(12,2)")
                * (
                    F.lit(1).cast("decimal(3,2)")
                    - F.col("disc").cast("decimal(3,2)")
                )
            ),
            2,
        )
        .cast("double")
        .alias("revenue")
    )
    df = spark.createDataFrame([(10.01, 0.50)], "price double, disc double")
    assert df.agg(exact).collect()[0].revenue == pytest.approx(5.01)
