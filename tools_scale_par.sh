#!/bin/bash
# Round-5 two-parallelism criterion on the 30M-row pre-tokenized table
# (north rule: same job, two cluster sizes, scaling efficiency >= 0.8).
#
# Methodology identical to the round-4 100M windows (BENCH.md): the plain
# `jobs validate` CLI (no input persist — scans parquet directly, like a
# real cluster), taskset-pinned to exactly N cores with SPARK_GRAFT_CPUS=N,
# interleaved (small, large) pairs x3 rounds so host drift hits both sides
# of every ratio equally. Wall times include full JVM startup.
#
# Prereq: tools_scale30m.sh has produced .scale30m/tokens.
set -euo pipefail
cd "$(dirname "$0")"
D=.scale30m
export SPARK_DRIVER_MEMORY=48g
[ -f "$D/tokens/_SUCCESS" ] || { echo "run tools_scale30m.sh first"; exit 1; }

run_one() {  # cores label round
  local cores=$1 label=$2 rnd=$3
  local out="$D/par_${label}_r${rnd}"
  rm -rf "$out"
  local t0=$(date +%s.%N)
  SPARK_GRAFT_CPUS=$cores taskset -c 0-$((cores - 1)) \
    python -m polars_genson_spark.jobs --shuffle-partitions $((cores * 8)) \
    validate --input "$D/tokens" --output "$out" --no-resume \
    > "$D/par_${label}_r${rnd}.log" 2>&1 || true  # exit 1 = planted all_passed:false
  local t1=$(date +%s.%N)
  echo "$cores $rnd $(echo "$t1 $t0" | awk '{printf "%.1f", $1-$2}')"
}

echo "cores round wall_s"
for rnd in 1 2 3; do
  run_one 4 small $rnd
  run_one 16 large $rnd
done
