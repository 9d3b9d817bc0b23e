#!/bin/bash
# Round-5 two-parallelism criterion (north rule: same job, two cluster
# sizes N and 4N, scaling efficiency >= 0.8) on a pre-tokenized table.
#
#   usage: tools_scale_par.sh [data_dir]   (default .scale30m; the round-5
#          runs use .scale100m — a 100M-row, 26 GiB, 640-file table)
#
# Methodology identical to the round-4 100M windows (BENCH.md): the plain
# `jobs validate` CLI (no input persist — scans parquet directly, like a
# real cluster), taskset-pinned to exactly N cores with SPARK_GRAFT_CPUS=N,
# interleaved (small, large) pairs x3 rounds so host drift hits both sides
# of every ratio equally.
#
# TWO TIMINGS per run: the outer wall (includes JVM/session startup — a
# per-run constant that amortizes to nil at the north rule's
# 10^12-sequence scale) and the in-job wall_s the CLI now emits
# (post-session: scan -> stats -> verdicts -> writes). The scaling ratio
# uses the in-job number; both are reported.
#
# CORE-RANGE SELECTION: co-tenants on this shared host pin work to LOW
# core ids, so "cores 0-15" and "cores 16-31" can differ >2.5x in
# effective speed (measured 2026-08-19: the fixed calibration kernel x16
# took 2.90 s on cores 0-15 vs 1.10 s on cores 16-31 in the same
# minute). Pinning both job sizes into the SAME contiguous range —
# chosen as the quieter 16-core half by a pre-run probe — keeps the
# N-vs-4N ratio a property of the ENGINE, not of which half of the box
# the neighbours happen to occupy.
#
# CALIBRATION BRACKET: each job run is bracketed by the same fixed
# pure-CPU kernel x16 pinned to the chosen half. On an idle half the
# kernel takes ~1.1 s; anything above that is co-tenant contention
# stealing cycles DURING the window. The bracket times are printed per
# run so the transcribed evidence shows exactly how quiet each side of
# each ratio was — and lets a contaminated pair be discarded for a
# clean one instead of hand-waving about "load".
set -euo pipefail
cd "$(dirname "$0")"
D=${1:-.scale30m}
export SPARK_DRIVER_MEMORY=48g
export SPARK_GRAFT_CONSOLE_PROGRESS=false
[ -f "$D/tokens/_SUCCESS" ] || { echo "no $D/tokens — run the generator first"; exit 1; }

# --- probe: fixed CPU kernel x16 on each half; pick the quieter half ---
probe() {
python - "$D" <<'EOF'
import os, sys, time, multiprocessing as mp
import numpy as np

def kern(_=0):
    x = np.arange(1_500_000, dtype=np.float64)
    for _ in range(40):
        x = np.sqrt(x * 1.0001 + 1.0)
    return float(x[0])

def timed(mask, n):
    os.sched_setaffinity(0, mask)
    with mp.get_context("fork").Pool(n) as p:
        t0 = time.perf_counter()
        p.map(kern, range(n))
        return time.perf_counter() - t0

lo = timed(set(range(0, 16)), 16)
hi = timed(set(range(16, 32)), 16)
os.sched_setaffinity(0, set(range(32)))
base = 0 if lo <= hi else 16
print(f"probe lo={lo:.3f}s hi={hi:.3f}s -> base core {base}", flush=True)
with open(os.path.join(sys.argv[1], "par_probe.txt"), "w") as f:
    f.write(f"{base} {lo:.3f} {hi:.3f}\n")
EOF
}

# fixed kernel x16 on the chosen half — the per-run contention bracket
calib() {
python - "$BASE" <<'EOF'
import os, sys, time, multiprocessing as mp
import numpy as np

def kern(_=0):
    x = np.arange(1_500_000, dtype=np.float64)
    for _ in range(40):
        x = np.sqrt(x * 1.0001 + 1.0)
    return float(x[0])

base = int(sys.argv[1])
os.sched_setaffinity(0, set(range(base, base + 16)))
with mp.get_context("fork").Pool(16) as p:
    t0 = time.perf_counter()
    p.map(kern, range(16))
    print(f"{time.perf_counter() - t0:.2f}")
EOF
}

probe
BASE=$(awk '{print $1}' "$D/par_probe.txt")

run_one() {  # cores label round
  local cores=$1 label=$2 rnd=$3
  local out="$D/par_${label}_r${rnd}"
  rm -rf "$out"
  local cpre cpost
  cpre=$(calib)
  local t0=$(date +%s.%N)
  SPARK_GRAFT_CPUS=$cores taskset -c $BASE-$((BASE + cores - 1)) \
    python -m polars_genson_spark.jobs --shuffle-partitions $((cores * 8)) \
    validate --input "$D/tokens" --output "$out" --no-resume \
    > "$D/par_${label}_r${rnd}.log" 2>&1 || true  # exit 1 = planted all_passed:false
  local t1=$(date +%s.%N)
  cpost=$(calib)
  local outer injob
  outer=$(echo "$t1 $t0" | awk '{printf "%.1f", $1-$2}')
  injob=$(grep -o '"wall_s": [0-9.]*' "$D/par_${label}_r${rnd}.log" | tail -1 | awk '{print $2}')
  echo "$cores $rnd outer=${outer}s injob=${injob:-NA}s calib_pre=${cpre}s calib_post=${cpost}s"
}

# N and 4N are overridable so the same harness evidences several
# cluster-size pairs (e.g. SMALL=2 LARGE=8, the round-4 framing, and
# SMALL=4 LARGE=16); ROUNDS likewise.
SMALL=${SMALL:-4}
LARGE=${LARGE:-16}
ROUNDS=${ROUNDS:-3}
echo "data=$D  cores round timings (base core $BASE; idle calib ~1.1s)"
for rnd in $(seq 1 "$ROUNDS"); do
  run_one "$SMALL" "small${SMALL}" $rnd
  run_one "$LARGE" "large${LARGE}" $rnd
done
