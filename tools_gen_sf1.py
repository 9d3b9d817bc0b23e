"""Rebuild a local sf1.0-scale replica of the driver's synthetic tables
for TIMING ONLY (the driver generates its own sf1.0 at measurement time;
/root/testdata is read-only and holds sf<=0.1).

Methodology (matches empirical structure of /root/testdata/sf0.1):
- TPC-H-ish tables (customer/orders/lineitem/part/supplier): 10 copies
  of sf0.1 with every entity key shifted by copy*10_000_000 so joins
  stay 1:1 per copy and all value distributions are preserved exactly.
  region/nation are fixed dims, copied as-is.
- events: generated fresh — 1M rows over the SAME 30-day window (event
  density scales with sf, the span does not: verified across
  sf0.001/0.01/0.1), user_id uniform over 15k users (10x sf0.1's 1.5k),
  event_type uniform over the 5 observed types, value ~ Exp(50) (mean
  49.87 observed), props always '{"k": <0..99>}' (100% of sf0.1 rows
  match that shape).
- documents: 50k fresh docs from the exact 31-word vocabulary of sf0.1,
  uniform 10..100 words, lang {en:.41, zh/es/fr/de:~.15}, source =
  doc_id % 20 (round-robin, as observed), n_chars=len(text); near-dup
  pairs planted at the observed rate (228/5000 docs are base+' dup'
  copies of another doc) and exact dups at 16/5000.
- embeddings: 20k unit-norm 64-dim uniform vectors (no cluster
  structure at sf0.1: 0 pairs with cos>0.95), label uniform 0..9.

Output: /tmp/sf1.0/*.parquet (pyarrow defaults — single file, 1Mi-row
row groups, matching the one-row-group layout of the driver's files for
docs/events).

Usage: python tools_gen_sf1.py [outdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
KEY_SHIFT = 10_000_000

VOCAB = None  # filled from sf0.1


def _read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def replicate_tpch(out):
    import pyarrow.compute as pc

    shifts = {
        "customer": ["c_custkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
    }
    for name, keys in shifts.items():
        base = _read(name)
        copies = []
        for i in range(10):
            t = base
            for k in keys:
                idx = t.schema.get_field_index(k)
                t = t.set_column(
                    idx, k, pc.add(t.column(k), i * KEY_SHIFT)
                )
            copies.append(t)
        full = pa.concat_tables(copies)
        pq.write_table(full, f"{out}/{name}.parquet")
        print(name, full.num_rows)
    for name in ("region", "nation"):
        pq.write_table(_read(name), f"{out}/{name}.parquet")
        print(name, "copied")


def gen_events(out, rng):
    n = 1_000_000
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    t1 = np.datetime64("2024-01-31T00:00:00", "us").astype("int64")
    ts = np.sort(rng.integers(t0, t1, size=n))
    types = np.array(["click", "view", "purchase", "signup", "error"])
    tab = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 15_000, n), pa.int64()),
            "event_type": pa.array(types[rng.integers(0, 5, n)]),
            "value": pa.array(
                np.round(rng.exponential(50.0, n), 2), pa.float64()
            ),
            "props": pa.array(
                [
                    '{"k": %d}' % k
                    for k in rng.integers(0, 100, n)
                ]
            ),
        }
    )
    pq.write_table(tab, f"{out}/events.parquet")
    print("events", n)


def gen_documents(out, rng):
    vocab = VOCAB
    n = 50_000
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    lens = rng.integers(10, 101, n)
    texts: list[str] = []
    for i in range(n):
        words = vocab[rng.integers(0, len(vocab), lens[i])]
        texts.append(" ".join(words))
    # plant near-dups (base + ' dup') and exact dups at sf0.1 rates
    n_near = int(n * 228 / 5000)
    n_exact = int(n * 16 / 5000)
    idx = rng.permutation(n)
    near_targets = idx[:n_near]
    exact_targets = idx[n_near : n_near + n_exact]
    for j in near_targets:
        src = int(rng.integers(0, n))
        texts[int(j)] = texts[src] + " dup"
    for j in exact_targets:
        texts[int(j)] = texts[int(rng.integers(0, n))]
    tab = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs[rng.choice(5, n, p=lang_p)]),
            "source": pa.array(["src%d" % (i % 20) for i in range(n)]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts]), pa.int64()
            ),
        }
    )
    pq.write_table(tab, f"{out}/documents.parquet")
    print("documents", n)


def gen_embeddings(out, rng):
    n = 20_000
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n), pa.int32()),
        }
    )
    pq.write_table(tab, f"{out}/embeddings.parquet")
    print("embeddings", n)


def main():
    global VOCAB
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    os.makedirs(out, exist_ok=True)
    docs = pq.read_table(
        f"{SRC}/documents.parquet", columns=["text"]
    ).to_pydict()["text"]
    VOCAB = np.array(sorted({w for t in docs[:2000] for w in t.split()}))
    print("vocab", len(VOCAB))
    rng = np.random.default_rng(42)
    replicate_tpch(out)
    gen_events(out, rng)
    gen_documents(out, rng)
    gen_embeddings(out, rng)


if __name__ == "__main__":
    main()
