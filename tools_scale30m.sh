#!/bin/bash
# Round-5 scale-proof (VERDICT r04 #2): the FULL curate chain at 30M docs.
#
# Round 4 proved the full chain at 10M and the tokenize/validate legs at
# 30M; this run closes the gap — exact+near dedup -> SemDeDup (gram
# backend, auto-k ~293 over 600k vectors) -> semantic + n-gram decon ->
# quality -> chunk -> split -> pack (deterministic) -> epoch shuffle, all
# at 3x the proven full-chain scale, with the planted-structure counts as
# the correctness oracle (sources/scale_docs.py docstring).
#
# Data lives in the gitignored .scale30m/; evidence (stage counts,
# stage_seconds, log assertions) is transcribed into BENCH.md.
set -euo pipefail
cd "$(dirname "$0")"
D=.scale30m
mkdir -p "$D"
export SPARK_DRIVER_MEMORY=64g
export SPARK_GRAFT_CPUS=32

step() { echo "=== $1 $(date -u +%H:%M:%S) ==="; }

if [ ! -f "$D/documents/_SUCCESS" ]; then
  step generate-docs
  python -m polars_genson_spark.jobs generate-docs \
    --output "$D/documents" --rows 30000000 --seed 42 \
    --embeddings-output "$D/embeddings" --embedding-rows 600000 \
    --embedding-dim 64 \
    --benchmark-output "$D/benchmark" \
    --benchmark-embeddings-output "$D/benchmark_embeddings" \
    2>> "$D/generate.log" | tee "$D/generate.json"
fi

step curate
python -m polars_genson_spark.jobs \
  --shuffle-partitions 256 curate \
  --input "$D/documents" --output "$D/chunks" \
  --benchmark "$D/benchmark" \
  --embeddings "$D/embeddings" \
  --benchmark-embeddings "$D/benchmark_embeddings" \
  --chunk-size 128 --pack-context-len 512 --pack-pad-id 0 \
  --split 'train:98,val:1,test:1' --shuffle-seed 7 \
  --minhash-bucket-max 2000 --checkpoint-dir "$D/.ckpt" \
  > "$D/curate.log" 2>> "$D/curate.log" || { tail -50 "$D/curate.log"; exit 1; }
tail -5 "$D/curate.log"

step tokenize
python -m polars_genson_spark.jobs \
  --shuffle-partitions 256 tokenize \
  --input "$D/documents" --output "$D/tokens" \
  > "$D/tokenize.log" 2> "$D/tokenize.time" || { tail -50 "$D/tokenize.log"; exit 1; }
tail -3 "$D/tokenize.log"

step validate
python -m polars_genson_spark.jobs \
  --shuffle-partitions 256 validate \
  --input "$D/tokens" --output "$D/validation" \
  > "$D/validate.log" 2> "$D/validate.time" || true
tail -3 "$D/validate.log"
step done
