"""Optimization-round measurement harness (guide §1) — NOT the driver
bench. `bench.py` is frozen for measurement; this file exists so the
round can isolate per-query cost (noop sink), capture
``explain("formatted")`` plans into plans/r06/, and time subsets quickly
without re-running the whole frozen suite.

Usage:
    python bench_extra.py plans  [query ...]   # write plans/r06/<q>_<tag>.txt
    python bench_extra.py time   [query ...]   # best-of-N noop-sink seconds
    python bench_extra.py hash   [query ...]   # bench.py's exact materialize()

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
measured scale), SPARK_GRAFT_CPUS, PGS_BENCH_REPS (default 3),
PGS_PLAN_TAG (default "before").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark():
    from polars_genson_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    return get_spark(
        app_name="pgs-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _materialize_hash(df):
    """bench.py's exact materialize(): full-column xxhash64 rollup."""
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in df.columns]
    try:
        df.agg(F.sum(F.xxhash64(*cols))).collect()
    except Exception:
        df.agg(F.sum(F.length(F.to_json(F.struct(*cols))))).collect()


def _materialize_noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    reps = int(os.environ.get("PGS_BENCH_REPS", "3"))
    tag = os.environ.get("PGS_PLAN_TAG", "before")

    spark = _spark()
    import __spark_entry__ as E

    q = E.queries()
    if not names:
        names = list(q)

    if mode == "plans":
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = q[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = f"plans/r06/{name}_{tag}.txt"
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({len(plan)} bytes)")
        spark.stop()
        return

    mat = _materialize_hash if mode == "hash" else _materialize_noop
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"{mode}:{name}")
        # one warm-up at sf0.001 to amortise codegen, like bench.py
        try:
            q[name](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            mat(q[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        samples.sort()
        out[name] = [round(s, 3) for s in samples]
        print(f"{name}: best={samples[0]:.3f} all={[round(s,3) for s in samples]}")
    spark.sparkContext.setJobDescription(None)
    total = sum(v[0] for v in out.values())
    print(f"TOTAL(best) {total:.3f}s over {len(out)} queries [{mode}, {sf_dir}]")
    spark.stop()


if __name__ == "__main__":
    main()
