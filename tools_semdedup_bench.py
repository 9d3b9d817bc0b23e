"""A/B benchmark for semantic_dedup pair backends at scale.

Regenerates the BENCH.md 1M-vector corpus spec deterministically —
n rows of 64-dim vectors where each even/odd id pair shares a base
direction (cosine >= 0.99 within the pair, pseudo-random directions
across pairs) — entirely inside Spark (mapInPandas, partition-order
independent: every value derives from the row id), then runs
``semantic_dedup(return_discards=True)`` with each requested backend
on the SAME input and reports wall time, discard count, and pair
recall. With ``--backend both`` it also asserts the two discard sets
are IDENTICAL via a distributed except-union check, which is the
at-scale extension of ``test_semantic_dedup_gram_join_parity``.

Usage:
    python tools_semdedup_bench.py [--rows 1000000] [--dim 64]
        [--threshold 0.99] [--backend both|gram|join] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import pandas as pd


def build_corpus(spark, rows: int, dim: int):
    """Deterministic planted-pair corpus: id 2p and 2p+1 share base
    direction p; the odd row adds a small deterministic jitter
    (relative norm ~0.03 at dim=64 -> in-pair cosine ~0.9995)."""
    from pyspark.sql import functions as F  # noqa: F401

    j64 = np.arange(dim, dtype=np.uint64)

    def _splitmix64(z: np.ndarray) -> np.ndarray:
        # vectorized splitmix64: iid-quality u64 per input counter
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    def _unit(counters: np.ndarray) -> np.ndarray:
        # hash -> uniform [-1, 1): iid components give well-spread
        # directions (cross-pair cosine std ~ dim**-0.5)
        return (
            _splitmix64(counters).astype(np.float64) / 2.0**63 - 1.0
        )

    def gen(batches):
        with np.errstate(over="ignore"):
            for pdf in batches:
                ids = pdf["id"].to_numpy().astype(np.uint64)
                pair = ids // np.uint64(2)
                base = _unit(
                    pair[:, None] * np.uint64(dim) + j64[None, :]
                )
                odd = (ids % np.uint64(2)).astype(np.float64)[:, None]
                jitter = 0.02 * _unit(
                    np.uint64(1 << 40)
                    + ids[:, None] * np.uint64(dim)
                    + j64[None, :]
                )
                vecs = base + odd * jitter
                yield pd.DataFrame(
                    {
                        "vec_id": ids.astype(np.int64),
                        "embedding": list(vecs),
                    }
                )

    return (
        spark.range(rows)
        .repartition(64)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--threshold", type=float, default=0.99)
    ap.add_argument(
        "--backend", choices=["both", "gram", "join"], default="both"
    )
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from polars_genson_spark.operators.similarity import semantic_dedup

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("semdedup-ab")
        .getOrCreate()
    )
    corpus = build_corpus(spark, args.rows, args.dim).persist()
    n = corpus.count()  # materialize so generation isn't timed

    backends = (
        ["gram", "join"] if args.backend == "both" else [args.backend]
    )
    results: dict[str, dict] = {}
    discards = {}
    for be in backends:
        t0 = time.monotonic()
        d = semantic_dedup(
            corpus,
            dim=args.dim,
            vec_col="embedding",
            id_col="vec_id",
            threshold=args.threshold,
            return_discards=True,
            pair_backend=be,
        ).persist()
        cnt = d.count()
        wall = time.monotonic() - t0
        # planted recall: one of {2p, 2p+1} dropped per planted pair
        results[be] = {
            "wall_s": round(wall, 1),
            "discards": cnt,
            "pair_recall": round(cnt / (n / 2), 4),
            "rows_per_s": int(n / wall),
        }
        discards[be] = d
        print(json.dumps({"backend": be, **results[be]}), flush=True)

    if len(backends) == 2:
        a, b = discards["gram"], discards["join"]
        diff = (
            a.exceptAll(b).count() + b.exceptAll(a).count()
        )
        results["identical_discard_sets"] = diff == 0
        print(
            json.dumps(
                {
                    "identical_discard_sets": diff == 0,
                    "sym_diff_rows": diff,
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "rows": n,
                "dim": args.dim,
                "threshold": args.threshold,
                "cpus": args.cpus,
                **results,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
