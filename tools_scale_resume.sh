#!/bin/bash
# Round-5 resume-at-scale exercise (VERDICT r04 #6): SIGKILL a partial
# revalidation of the 30M-row pre-tokenized table mid-flight, resume,
# and assert (a) the manifest survived the kill un-torn (atomic rename),
# (b) the resumed run revalidates ONLY the mutated source, (c) the
# skipped sources' verdicts.parquet partitions — written by the first
# run's dynamic-partition-overwrite — survive byte-identical, and
# (d) the final pass/fail verdicts match a from-scratch (--no-resume)
# run on the same mutated table, with the revalidated source's rows
# value-identical to the from-scratch run's.
#
# Note on (d)'s granularity: skipped sources carry their metrics from
# validation time (documented semantics — drift is measured against the
# corpus as of that run), so float drift statistics are compared to the
# PHASE-1 snapshot for skipped sources and to the from-scratch run for
# the revalidated one; pass/fail must agree everywhere.
#
# Prereq: tools_scale30m.sh has produced .scale30m/tokens.
set -euo pipefail
cd "$(dirname "$0")"
D=.scale30m
export SPARK_DRIVER_MEMORY=64g
export SPARK_GRAFT_CPUS=32
[ -f "$D/tokens/_SUCCESS" ] || { echo "run tools_scale30m.sh first"; exit 1; }

step() { echo "=== $1 $(date -u +%H:%M:%S) ==="; }

step "phase 1: full validate into run dir B"
rm -rf "$D/run_b" "$D/tokens_mut" "$D/run_c" "$D/run_b_snap1"
python -m polars_genson_spark.jobs --shuffle-partitions 256 validate \
  --input "$D/tokens" --output "$D/run_b" > "$D/resume_p1.log" 2>&1 || true
tail -1 "$D/resume_p1.log" | head -c 400; echo
cp "$D/run_b/manifest.json" "$D/manifest_b1.json"
cp -al "$D/run_b" "$D/run_b_snap1"   # hardlink snapshot of phase-1 outputs

step "phase 2: mutate ONE source (append rows to 'books' via hardlink copy)"
mkdir -p "$D/tokens_mut"
cp -al "$D/tokens/." "$D/tokens_mut/"
python - <<'EOF'
import duckdb
# 1,000 extra clean 'books' rows (ids unique, token ids inside the
# sidecar vocab, n_tok consistent) — only the fingerprint changes
duckdb.sql("""
  COPY (
    SELECT 'extra-' || i AS doc_id,
           [CAST(i % 100 AS INT), CAST(i % 97 AS INT)] AS tokens,
           CAST(2 AS INT) AS n_tok,
           'books' AS source
    FROM range(1000) t(i)
  ) TO '.scale30m/tokens_mut/part-extra-books.parquet' (FORMAT PARQUET)
""")
EOF

step "phase 3: resume validate on the mutated table, SIGKILL mid-flight"
python -m polars_genson_spark.jobs --shuffle-partitions 256 validate \
  --input "$D/tokens_mut" --output "$D/run_b" > "$D/resume_p3.log" 2>&1 &
PID=$!
sleep 18
if kill -0 $PID 2>/dev/null; then
  kill -9 $PID
  echo "killed validate pid $PID at t=18s"
  wait $PID 2>/dev/null || true
else
  echo "WARNING: validate finished before the kill (t<18s)"
fi

step "phase 4: manifest un-torn?"
python - <<'EOF'
import json
m1 = json.load(open(".scale30m/manifest_b1.json"))
m2 = json.load(open(".scale30m/run_b/manifest.json"))  # must parse
if m2 == m1:
    print("manifest byte-identical across SIGKILL (kill landed pre-rename): OK")
else:
    # kill landed after the atomic rename: the new manifest must be
    # fully-formed with exactly the books revalidation recorded
    assert m2.get("validated_partitions") == ["books"], m2.get("validated_partitions")
    print("kill landed post-rename; new manifest fully-formed: OK")
EOF

step "phase 5: resume to completion + from-scratch reference"
python -m polars_genson_spark.jobs --shuffle-partitions 256 validate \
  --input "$D/tokens_mut" --output "$D/run_b" > "$D/resume_p5.log" 2>&1 || true
tail -1 "$D/resume_p5.log" | head -c 400; echo
python -m polars_genson_spark.jobs --shuffle-partitions 256 validate \
  --input "$D/tokens_mut" --output "$D/run_c" --no-resume \
  > "$D/resume_p5c.log" 2>&1 || true

step "phase 6: assertions"
python - <<'EOF'
import json
import duckdb

p5 = json.loads([l for l in open(".scale30m/resume_p5.log").read().splitlines() if l.strip().startswith("{")][-1])
mb0 = json.load(open(".scale30m/run_b/manifest.json"))
if p5["validated"] == ["books"]:
    # kill landed pre-commit: the resume redid exactly the mutated source
    assert len(p5["skipped"]) == 5, p5["skipped"]
elif p5["validated"] == []:
    # kill landed in the window after the manifest rename: phase 3
    # already committed the books revalidation, so a correct resume has
    # nothing left to do — the manifest must say books was the one redone
    assert mb0.get("validated_partitions") == ["books"], mb0
    assert len(p5["skipped"]) == 6, p5["skipped"]
else:
    raise AssertionError(p5["validated"])
print("resume scoped to the mutated source only: OK validated=", p5["validated"], "skipped=", p5["skipped"])

def verdicts(path):
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{path}/verdicts.parquet/**/*.parquet', "
        "hive_partitioning=1)"
    ).df()

vb = verdicts(".scale30m/run_b")
vs = verdicts(".scale30m/run_b_snap1")
vc = verdicts(".scale30m/run_c")
cols = sorted(vb.columns)
key = lambda df: df[cols].sort_values(cols).reset_index(drop=True)

# (c) skipped sources' verdict rows survive the resume byte-identical
skipped = set(p5["skipped"])
b_sk = key(vb[vb.source.isin(skipped)])
s_sk = key(vs[vs.source.isin(skipped)])
assert b_sk.equals(s_sk), "skipped sources' verdicts were clobbered by the resume"
print(f"skipped sources' verdict rows survived dynamic overwrite: OK ({len(b_sk)} rows)")

# (d) revalidated source value-matches the from-scratch run
b_bk = key(vb[vb.source == "books"])
c_bk = key(vc[vc.source == "books"])
assert b_bk.equals(c_bk), "revalidated 'books' verdicts differ from from-scratch"
print(f"revalidated source parity vs from-scratch: OK ({len(b_bk)} rows)")

# pass/fail agreement everywhere (drift floats may differ by baseline
# vintage for skipped sources — documented — but verdicts must agree)
pf = lambda df: df.set_index("source")["passed"].to_dict()
assert pf(vb) == pf(vc), "pass/fail verdicts disagree resumed-vs-scratch"
print("pass/fail verdict map parity resumed-vs-scratch: OK")

mb = json.load(open(".scale30m/run_b/manifest.json"))
assert sorted(mb["partitions"]) == sorted(mb["fingerprints"])
print("manifest partition coverage complete: OK")
EOF
step done
