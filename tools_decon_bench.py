"""A/B the decontaminate_trigram constant factor (VERDICT r04 #8).

Variants at sf0.1, best-of-3 each, interleaved to ride out host noise:
  A. current: explode distinct shingles, broadcast semi-join on STRING
  B. hashed: same plan but both sides join on xxhash64(shingle) — 8-byte
     probe keys instead of ~20-40-byte strings (collision odds 2^-64 per
     corpus×bench shingle pair; over-drop direction, never a leak)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from polars_genson_spark.operators.dedup import with_shingles
from polars_genson_spark.session import get_spark


def variant_a(corpus, benchmark):
    from polars_genson_spark.operators.decontaminate import contaminated_docs

    return contaminated_docs(corpus, benchmark)


def variant_b(corpus, benchmark, id_col="doc_id", text_col="text", n=3):
    bench_shingles = (
        with_shingles(benchmark, text_col, n)
        .select(F.explode("shingles").alias("shingle"))
        .select(F.xxhash64("shingle").alias("sh"))
        .distinct()
    )
    corpus_shingles = with_shingles(corpus, text_col, n).select(
        F.col(id_col), F.explode("shingles").alias("shingle")
    ).select(id_col, F.xxhash64("shingle").alias("sh"))
    hits = corpus_shingles.join(F.broadcast(bench_shingles), "sh")
    return hits.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shared"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="decon-ab", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    n_docs = docs.count()
    # benchmark set = same construction the entry query uses: a slice
    bench = docs.limit(500).select("doc_id", "text").persist()
    bench.count()

    res = {"a": [], "b": []}
    counts = {}
    for rep in range(3):
        for name, fn in (("a", variant_a), ("b", variant_b)):
            t0 = time.perf_counter()
            out = fn(docs, bench)
            counts[name] = out.count()
            res[name].append(time.perf_counter() - t0)
    import json

    print(json.dumps({
        "n_docs": n_docs,
        "hits_a": counts["a"],
        "hits_b": counts["b"],
        "a_best": round(min(res["a"]), 3),
        "a_all": [round(x, 3) for x in res["a"]],
        "b_best": round(min(res["b"]), 3),
        "b_all": [round(x, 3) for x in res["b"]],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
