"""Round-6 equivalence gate: prove each optimization rewrite computes the
IDENTICAL result before it ships.

For every (name, old_fn, new_fn) pair this runs both plans at the given
SF dirs and compares full row multisets exactly (sorted collect on keyed
output — result sets here are ≤ ~1M skinny rows). Any diff prints the
offending rows and exits non-zero.

Usage: python tools_r06_ab.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F


def _cmp(name, sf_dir, old_df, new_df) -> bool:
    cols = old_df.columns
    if cols != new_df.columns:
        print(f"FAIL {name}@{sf_dir}: columns {cols} != {new_df.columns}")
        return False
    if [f.dataType for f in old_df.schema] != [
        f.dataType for f in new_df.schema
    ]:
        print(
            f"FAIL {name}@{sf_dir}: schema {old_df.schema} != {new_df.schema}"
        )
        return False
    a = old_df.exceptAll(new_df)
    b = new_df.exceptAll(old_df)
    na, nb = a.count(), b.count()
    if na or nb:
        print(f"FAIL {name}@{sf_dir}: old-only={na} new-only={nb}")
        a.show(5, truncate=False)
        b.show(5, truncate=False)
        return False
    n = old_df.count()
    print(f"ok   {name}@{sf_dir}: {n} rows identical")
    return True


def main() -> None:
    from polars_genson_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="pgs-r06-ab",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        "/root/testdata/sf1.0",
    ]

    import __spark_entry__ as E

    ok = True
    for sf_dir in sf_dirs:
        docs = E._t(spark, sf_dir, "documents")

        # --- decontaminate_trigram: legacy string-shingle path vs current
        from polars_genson_spark.operators.dedup import with_shingles

        def legacy_contaminated(corpus, benchmark, n=3, min_shared=3):
            bench_shingles = (
                with_shingles(benchmark, "text", n)
                .select(F.explode("shingles").alias("shingle"))
                .select(F.xxhash64("shingle").alias("_sh"))
                .distinct()
            )
            corpus_shingles = (
                with_shingles(corpus, "text", n)
                .select(F.col("doc_id"), F.explode("shingles").alias("shingle"))
                .select("doc_id", F.xxhash64("shingle").alias("_sh"))
            )
            hits = corpus_shingles.join(F.broadcast(bench_shingles), "_sh")
            return (
                hits.groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_shared"))
                .where(F.col("n_shared") >= min_shared)
            )

        benchmark = docs.where(F.col("doc_id") % 29 == 0)
        corpus = docs.where(F.col("doc_id") % 29 != 0)
        ok &= _cmp(
            "decontaminate_trigram",
            sf_dir,
            legacy_contaminated(corpus, benchmark),
            E.q_decontaminate_trigram(spark, sf_dir),
        )

        # --- range_join_events: legacy binned-join plan vs current
        from polars_genson_spark.operators.relational import range_join

        e = E._t(spark, sf_dir, "events")
        left = e.select(F.col("event_id"), F.col("ts"))
        right = e.select(
            F.col("event_id").alias("event_id2"), F.col("ts").alias("ts2")
        )
        legacy_rj = (
            range_join(left, right, "ts", "ts2", 0.0, 300.0, bucket_width=300.0)
            .where(F.col("event_id") != F.col("event_id2"))
            .groupBy("event_id")
            .agg(F.count(F.lit(1)).alias("n_next"))
        )
        ok &= _cmp(
            "range_join_events",
            sf_dir,
            legacy_rj,
            E.q_range_join_events(spark, sf_dir),
        )

    print("ALL OK" if ok else "DIFFS FOUND")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
