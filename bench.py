"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", plus rows_per_sec for the flagship validation}.

The same JSON object is ALSO written to BENCH_OUT.json next to this
script: BENCH_r04's stdout line was pushed past the driver's tail window
by Spark progress bars, leaving `"parsed": null` — the file copy (plus
spark.ui.showConsoleProgress=false for the bench session) makes the
artifact machine-readable regardless of what else lands on stdout.

A `calibration` field times a FIXED pure-CPU workload (single-core and
all-core numpy loops) in the same window, so cross-round comparisons can
divide out shared-host tenant load: r04's raw suite total read 1.8×
slower than r03 on queries whose code had not changed, with the host at
load-average 10.8 from other tenants — best-of-3 spreads expose that
noise but don't normalize it; the calibration ratio does.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _calib_kernel(_arg: int = 0) -> float:
    """Fixed single-threaded CPU workload (~0.5s on an idle core).
    Elementwise numpy stays single-threaded (no BLAS), so one call
    measures exactly one core's effective speed under current load."""
    import numpy as np

    x = np.arange(1_500_000, dtype=np.float64)
    for _ in range(40):
        x = np.sqrt(x * 1.0001 + 1.0)
    return float(x[0])


def calibrate(cpus: int, reps: int = 3) -> dict:
    """Best-of-reps timings of the fixed kernel on one core and on all
    cores at once (multiprocessing pool, wall-clock). The all-core number
    is the one that degrades under tenant load; single-core catches
    frequency/steal effects. Units: seconds for the FIXED workload —
    compare the same field across rounds, not across machines."""
    import multiprocessing as mp

    single = min(
        _timed(_calib_kernel) for _ in range(reps)
    )
    all_core = None
    try:
        ctx = mp.get_context("fork")
        with ctx.Pool(cpus) as pool:
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                pool.map(_calib_kernel, range(cpus))
                samples.append(time.perf_counter() - t0)
            all_core = min(samples)
    except Exception:
        pass  # calibration must never sink the bench
    out = {
        "single_core_sec": round(single, 4),
        "all_core_workers": cpus,
    }
    if all_core is not None:
        out["all_core_sec"] = round(all_core, 4)
    return out


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # calibrate BEFORE the JVM exists so nothing of ours competes
    calibration = calibrate(int(cpus))

    from polars_genson_spark.session import get_spark

    spark = get_spark(
        app_name="pgs-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # progress bars on stdout pushed the r04 JSON line past the
        # driver's tail window — the bench session stays silent
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    import __spark_entry__ as E

    # warm the JVM/Arrow paths outside the timed region
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    q = E.queries()
    # Warm whole-stage-codegen compilation per query at the smallest SF so
    # the timed numbers measure steady-state throughput (what matters at
    # scale), not one-time JIT. Plan shapes are identical across SFs, so
    # the generated-code cache is hit at the timed SF.
    warm_dir = "/root/testdata/sf0.001"
    headline = [
        "q1_pricing_summary",
        "q3_top_orders",
        "q5_nation_revenue",
        "window_top2_orders",
        "events_hourly",
        "events_json",
        "stats_documents",
        "drift_nchars_chi2",
        "drift_ks_nchars",
        "hist_n_tok_corpus",
        "dedup_exact_text",
        "uniqueness_docs",
        "referential_lineitem_part",
        "minhash_near_dupes",
        "embedding_topk",
        "embedding_topk_lsh",
        "language_id",
        "schema_infer_events_props",
        "normalise_decode_events",
        "corpus_verdicts",
        # round-2 relational/curation widening
        "asof_purchase_view",
        "sessions_30m",
        "top_words_source",
        "near_dup_clusters",
        "decontaminate_trigram",
        "stratified_sample_docs",
        # round-2 relational breadth pack
        "q9_profit_nation_year",
        "q13_order_count_dist",
        "range_join_events",
        # round-3 additions (suite total grows accordingly; compare
        # like-for-like over shared queries vs BENCH_r02)
        "temperature_mix_docs",
        "semantic_decontaminate_docs",
        "bpe_tokenize_docs",
    ]

    for name in headline:
        try:
            q[name](spark, warm_dir).count()
        except Exception:
            pass  # warm-up only; real failures surface in the timed run

    # best-of-3 with min/max spread per query: the shared host's noise
    # windows (r03 recorded a phantom -31% on untouched code) must be
    # visible in the artifact, not mistakable for regressions
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    def materialize(df):
        """Force FULL computation of every output column. A bare count()
        lets Catalyst prune unreferenced projection columns (deterministic
        UDFs included), so projection-shaped queries (normalise/decode,
        language_id, per-row schemas) timed only their scan + filter —
        the exact hazard the labels macro section always avoided with a
        to_json checksum. xxhash64 is the cheap path; queries whose
        output types it can't hash (maps) fall back to the json length."""
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in df.columns]
        try:
            df.agg(F.sum(F.xxhash64(*cols))).collect()
        except Exception:
            df.agg(
                F.sum(F.length(F.to_json(F.struct(*cols))))
            ).collect()

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in headline:
        samples = []
        for _rep in range(reps):
            t0 = time.perf_counter()
            materialize(q[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[0], 3)
        spreads[name] = [round(samples[0], 3), round(samples[-1], 3)]

    # flagship throughput: validated sequences/sec on the corpus view
    corpus = E.corpus_view(spark, sf_dir)
    n_rows = corpus.count()
    full_samples = []
    for _rep in range(reps):
        t0 = time.perf_counter()
        q["corpus_verdicts"](spark, sf_dir).collect()
        full_samples.append(time.perf_counter() - t0)
    full_samples.sort()
    validate_sec = full_samples[0]
    timings["corpus_validate_full"] = round(validate_sec, 3)
    spreads["corpus_validate_full"] = [
        round(full_samples[0], 3), round(full_samples[-1], 3)
    ]

    # flagship at scale: full validation of a generated 1M-row corpus
    # (generation + cache materialisation excluded from the timed window)
    from polars_genson_spark.config import ValidationConfig
    from polars_genson_spark.operators.verdicts import (
        finalise_summary,
        validate_corpus,
    )
    from polars_genson_spark.sources.corpus import (
        allowed_sources_df,
        generate_corpus,
    )

    n_big = 1_000_000
    big = generate_corpus(spark, n_big, seed=42).persist()
    big.count()
    allowed = allowed_sources_df(spark)
    big_samples = []
    for _rep in range(reps):
        t0 = time.perf_counter()
        report = validate_corpus(big, allowed, ValidationConfig())
        finalise_summary(report)
        report.violations.count()
        big_samples.append(time.perf_counter() - t0)
        report.violations.unpersist()
        report.verdicts.unpersist()
    big.unpersist()
    big_samples.sort()
    big_sec = big_samples[0]
    timings["corpus_validate_1m"] = round(big_sec, 3)
    spreads["corpus_validate_1m"] = [
        round(big_samples[0], 3), round(big_samples[-1], 3)
    ]

    # schema-inference throughput (reference benchmarks 10-row latency at
    # ~36.6 inferences/s; we measure docs/sec through the same pipeline).
    # best-of-reps like every other metric — this was the one remaining
    # single-shot number, the exact noise hazard called out above
    n_docs = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    infer_samples = []
    for _rep in range(reps):
        t0 = time.perf_counter()
        q["schema_infer_events_props"](spark, sf_dir).count()
        infer_samples.append(time.perf_counter() - t0)
    infer_samples.sort()
    infer_sec = infer_samples[0]

    # apples-to-apples vs the reference's OWN macro bench data (Wikidata
    # labels.parquet, read-only) at 100x replication — only when the
    # reference checkout is present (guarded: the driver may run bench
    # in environments without /root/reference)
    ref_labels = "/root/reference/bench/data/labels.parquet"
    if os.path.exists(ref_labels):
        import polars_genson_spark as pgs
        from pyspark.sql import functions as F

        labels = (
            spark.read.parquet(ref_labels)
            .withColumn("_r", F.explode(F.sequence(F.lit(1), F.lit(100))))
            .drop("_r")
            .repartition(int(cpus))
            .persist()
        )
        n_labels = labels.count()
        lcfg = pgs.InferenceConfig(wrap_root="labels")
        # one untimed warmup of both paths: the first pass pays Python
        # worker spawn + Arrow-codepath warmup and measures 2-3x slower
        # than steady state even on an idle host (measured: rep0 6.2s vs
        # reps1-4 2.7-2.9s at load 0.0), which is a property of the
        # session, not of the code under test
        pgs.infer_json_schema(labels, "labels", lcfg)
        (
            pgs.normalise_json(labels, "labels", lcfg, decode=True)
            .select(F.sum(F.length(F.to_json("labels"))))
            .collect()
        )
        infer_samples, norm_samples = [], []
        for _rep in range(reps):  # median-of-N: r03's single shot
            # recorded a 31% host-noise window as a regression
            t0 = time.perf_counter()
            pgs.infer_json_schema(labels, "labels", lcfg)
            infer_samples.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            (
                pgs.normalise_json(labels, "labels", lcfg, decode=True)
                .select(F.sum(F.length(F.to_json("labels"))))
                .collect()
            )
            norm_samples.append(time.perf_counter() - t0)
        labels.unpersist()
        infer_samples.sort()
        norm_samples.sort()
        infer_dt = infer_samples[len(infer_samples) // 2]
        norm_dt = norm_samples[len(norm_samples) // 2]
        # reported as standalone fields, NOT in the suite total: the
        # cross-round headline comparison must stay like-for-like
        extra_labels = {
            "labels_infer_sec": round(infer_dt, 3),
            "labels_infer_spread": [
                round(infer_samples[0], 3), round(infer_samples[-1], 3)
            ],
            "labels_normalise_sec": round(norm_dt, 3),
            "labels_normalise_spread": [
                round(norm_samples[0], 3), round(norm_samples[-1], 3)
            ],
            "labels_docs": n_labels,
            "labels_infer_docs_per_sec": round(n_labels / infer_dt, 1),
            "labels_normalise_docs_per_sec": round(n_labels / norm_dt, 1),
        }
    else:
        extra_labels = {}

    # BPE apply throughput (VERDICT r03 task 3): the one hot-path
    # component that is Python-bound — quantified so the compiled
    # swap-in decision (tokenizer.py docstring) is data-driven.
    # Training (one corpus rollup + driver merge loop) stays outside
    # the timed window; the timed region is the mapInPandas apply.
    from polars_genson_spark.operators.tokenizer import (
        bpe_tokenize_ids,
        train_bpe_with_vocab,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    n_bpe_docs = docs.count()
    merges, vocab = train_bpe_with_vocab(docs, n_merges=200)
    bpe_samples, n_bpe_tokens = [], 0
    for _rep in range(reps):
        t0 = time.perf_counter()
        n_bpe_tokens = (
            bpe_tokenize_ids(docs, merges, vocab)
            .agg(F.sum("n_tok"))
            .collect()[0][0]
        )
        bpe_samples.append(time.perf_counter() - t0)
    docs.unpersist()
    bpe_samples.sort()
    bpe_sec = bpe_samples[0]
    extra_labels.update({
        "bpe_apply_sec": round(bpe_sec, 3),
        "bpe_apply_spread": [
            round(bpe_samples[0], 3), round(bpe_samples[-1], 3)
        ],
        # sum() over zero rows is None (empty/whitespace-only corpus):
        # fail soft with 0, not a TypeError after all the timing work
        "bpe_docs": n_bpe_docs,
        "bpe_tokens": int(n_bpe_tokens or 0),
        "bpe_docs_per_sec": round(n_bpe_docs / bpe_sec, 1),
        "bpe_tokens_per_sec": round((n_bpe_tokens or 0) / bpe_sec, 1),
    })

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_spread": spreads,
        "bench_reps": reps,
        "sf": sf,
        **extra_labels,
        "validated_rows": n_rows,
        # renamed from validated_rows_per_sec (VERDICT r04 #3): the 5k-row
        # sf0.1 suite timing is pure fixed overhead (job scheduling + plan
        # compilation), not throughput — corpus_1m_rows_per_sec and the
        # 10M/100M BENCH.md runs are the real rows/sec signal
        "validate_fixed_overhead_sec": round(validate_sec, 3),
        "corpus_1m_rows_per_sec": round(n_big / big_sec, 1),
        "inferred_docs_per_sec": round(n_docs / infer_sec, 1),
        "cpus": int(cpus),
        "calibration": calibration,
    }
    line = json.dumps(out)
    # file copy first: stdout may be tailed/truncated by the harness
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_OUT.json"
    )
    try:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass  # read-only checkout must not sink the stdout contract
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
