"""Quantify the compiled-tokenizer swap-in boundary (VERDICT r04 #5).

The BPE apply is the engine's one Python-bound hot path
(`tokenizer._segment` inside mapInPandas). This tool isolates WHERE the
time goes so the documented "swap in a compiled tokenizer" claim is
bounded by data, not hand-waving:

1. μs/word of pure-Python `_segment` over the corpus's unique words;
2. cache hit rate of the apply loop's seed+cache policy over the real
   word stream (Zipf head absorbs most lookups);
3. the apply loop timed driver-side twice — real `_segment` vs all-hits
   (segmentation cost zeroed) — giving the exact fraction of loop time
   the kernel owns;
4. projected tokens/s if `_segment` were 50× faster (a compiled kernel's
   typical win), i.e. whether the Spark plumbing or the Python kernel
   saturates first.

Prints ONE JSON line; paste into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from polars_genson_spark.operators.tokenizer import (
    _py_words,
    _segment,
    train_bpe_with_vocab,
)
from polars_genson_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_sample = int(os.environ.get("BPE_KERNEL_SAMPLE_DOCS", "20000"))
    spark = get_spark(
        app_name="bpe-kernel", master="local[8]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # the sf* testdata vocabulary is tiny (31 unique words at sf0.1 —
    # every lookup hits the cache and the kernel fraction reads ~0);
    # point BPE_KERNEL_DOCS at a scale_docs corpus (20k-word Zipf vocab)
    # for a representative measurement
    docs_path = os.environ.get(
        "BPE_KERNEL_DOCS", f"{sf_dir}/documents.parquet"
    )
    docs = spark.read.parquet(docs_path)
    merges, vocab = train_bpe_with_vocab(docs, n_merges=200)
    ranks = {pair: i for i, pair in enumerate(merges)}

    texts = [
        r["text"]
        for r in docs.select("text").limit(n_sample).collect()
        if r["text"]
    ]
    word_stream: list[str] = []
    for t in texts:
        word_stream.extend(_py_words(t))
    uniq = list(dict.fromkeys(word_stream))

    # 1. kernel μs/word over unique words (the only words that PAY it)
    t0 = time.perf_counter()
    segs = {w: _segment(w, ranks) for w in uniq}
    seg_sec = time.perf_counter() - t0
    seg_us_per_word = 1e6 * seg_sec / max(len(uniq), 1)

    # 2+3. the apply loop, real vs all-hit (cache pre-warmed = the bound
    # a zero-cost kernel converges to), measured over the same stream
    def loop(cache: dict) -> float:
        t0 = time.perf_counter()
        n = 0
        for t in texts:
            doc: list = []
            for w in _py_words(t):
                seg = cache.get(w)
                if seg is None:
                    seg = _segment(w, ranks)
                    cache[w] = seg
                doc.extend(seg)
            n += len(doc)
        return time.perf_counter() - t0

    real_sec = loop({})          # cold cache: pays _segment per unique word
    warm_sec = loop(dict(segs))  # all-hit: kernel cost fully removed
    n_words = len(word_stream)
    n_tokens = sum(len(s) for s in segs.values())  # per-unique; recompute:
    n_tokens = sum(len(segs[w]) for w in word_stream)
    hit_rate = 1.0 - len(uniq) / max(n_words, 1)

    kernel_sec = max(real_sec - warm_sec, 0.0)
    # 4. projection: compiled kernel = kernel_sec / 50, loop floor stays
    fast_sec = warm_sec + kernel_sec / 50.0
    out = {
        "docs": docs_path,
        "sample_docs": len(texts),
        "words": n_words,
        "unique_words": len(uniq),
        "cache_hit_rate": round(hit_rate, 4),
        "segment_us_per_word": round(seg_us_per_word, 2),
        "loop_real_sec": round(real_sec, 3),
        "loop_allhit_sec": round(warm_sec, 3),
        "kernel_fraction_of_loop": round(kernel_sec / max(real_sec, 1e-9), 3),
        "tokens": n_tokens,
        "tokens_per_sec_real": round(n_tokens / max(real_sec, 1e-9), 1),
        "tokens_per_sec_allhit": round(n_tokens / max(warm_sec, 1e-9), 1),
        "tokens_per_sec_projected_50x_kernel": round(
            n_tokens / max(fast_sec, 1e-9), 1
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
