"""A/B the BPE apply kernels: per-word Python loop vs Arrow ragged-gather.

Measures `bpe_tokenize_ids` end-to-end (train once, apply + sum(n_tok)
to force full materialization) on a planted-structure scale_docs corpus
(20k-word Zipf vocabulary — representative cache behavior, unlike the
31-word sf* testdata). Variants interleaved L/V/L/V..., best-of-N each,
so host noise hits both sides alike:

  L. impl="loop"   — the reference mapInPandas per-word-occurrence loop
  V. impl="vector" — mapInArrow: factorize words, segment unique words
                     only, reassemble token streams with numpy cumsum /
                     repeat index arithmetic + one Arrow take
  J. join apply    — posexplode + unique-word segment + regroup (context)

Also asserts L and V outputs are bit-identical on a 50k-doc slice
before timing anything (a fast A/B of two DIFFERENT answers is not an
A/B). Prints ONE JSON line; paste into BENCH.md.

Usage: python tools_bpe_ab.py [--rows 1000000] [--reps 3] [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from polars_genson_spark.operators.tokenizer import (
    bpe_tokenize_ids,
    bpe_tokenize_ids_join,
    train_bpe_with_vocab,
)
from polars_genson_spark.session import get_spark


def force(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.select(F.sum("n_tok")).collect()[0][0]
    return time.perf_counter() - t0, int(n or 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--n-merges", type=int, default=500)
    ap.add_argument("--data", default=".scratch/bpeab")
    args = ap.parse_args()

    spark = get_spark(
        app_name="bpe-ab",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    docs_path = os.path.join(args.data, f"docs{args.rows}")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        from polars_genson_spark.sources.scale_docs import generate_documents

        generate_documents(spark, args.rows, seed=17).write.mode(
            "overwrite"
        ).parquet(docs_path)
    docs = spark.read.parquet(docs_path)

    merges, vocab, words = train_bpe_with_vocab(
        docs, n_merges=args.n_merges, return_words=True
    )

    # correctness first: both kernels, same 50k slice, identical output
    slice_df = docs.limit(50_000).persist()
    slice_df.count()
    a = sorted(
        (r[0], tuple(r[1]))
        for r in bpe_tokenize_ids(
            slice_df, merges, vocab, seed_words=words, impl="loop"
        ).collect()
    )
    b = sorted(
        (r[0], tuple(r[1]))
        for r in bpe_tokenize_ids(
            slice_df, merges, vocab, seed_words=words, impl="vector"
        ).collect()
    )
    assert a == b, "loop/vector outputs diverge — fix before timing"
    slice_df.unpersist()

    variants = {
        "loop": lambda: bpe_tokenize_ids(
            docs, merges, vocab, seed_words=words, impl="loop"
        ),
        "vector": lambda: bpe_tokenize_ids(
            docs, merges, vocab, seed_words=words, impl="vector"
        ),
        "join": lambda: bpe_tokenize_ids_join(docs, merges, vocab),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    tokens = None
    for _ in range(args.reps):
        for name, make in variants.items():
            sec, n = force(make())
            times[name].append(round(sec, 2))
            if tokens is None:
                tokens = n
            assert n == tokens, f"{name} token count {n} != {tokens}"

    best = {k: min(v) for k, v in times.items()}
    print(json.dumps({
        "rows": args.rows,
        "cpus": args.cpus,
        "n_merges": args.n_merges,
        "total_tokens": tokens,
        "best_sec": best,
        "spread_sec": times,
        "tokens_per_sec": {
            k: round(tokens / s, 0) for k, s in best.items()
        },
        "vector_speedup_vs_loop": round(best["loop"] / best["vector"], 2),
    }))


if __name__ == "__main__":
    main()
