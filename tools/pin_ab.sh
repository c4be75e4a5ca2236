#!/bin/bash
# pin_ab.sh — generalized interleaved one-key pin A/B (the
# AB_R16_RETENTION method as a tool; SURVEY §6/§11 ritual).
#
# Adjudicates "key X reads N× its BASELINE pin — regression or pin
# fluke?" in minutes instead of a round of watch-listing:
#   1. builds a worktree at the PIN commit (the commit whose quiet-box
#      run produced the disputed pin), compiled once, reused across
#      invocations;
#   2. runs PAIRS alternating direct-java graft.Bench invocations of
#      the ONE key (SPARK_GRAFT_BENCH_ONLY) on HEAD and the pin tree —
#      interleaved, so ambient load hits both builds equally;
#   3. ITERS iterations per run (default 15 — 5-iter runs are still
#      JIT-descending at iter 5, see AB_R16_RETENTION);
#   4. summarizes head-over-pin median-of-mins → FLAT / REGRESSED and
#      the conservative re-pin value (min across all converged runs).
#
# Usage: tools/pin_ab.sh KEY[,KEY...] PIN_COMMIT [PAIRS=3] [ITERS=15] [OUT=tmp-pinab-KEY]
# Output: $OUT/summary.json (+ per-run jsons and log.txt).
# Multi-key (r18): a comma list runs ALL keys in each interleaved
# invocation (one session startup amortized across the disputes) and
# summary.json nests a per-key verdict under "keys". Record results in
# docs/AB_INDEX.md.
set -u
KEY=${1:?usage: pin_ab.sh KEY PIN_COMMIT [PAIRS] [ITERS] [OUT]}
PIN=${2:?need the pin commit}
PAIRS=${3:-3}
ITERS=${4:-15}
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT=${5:-$REPO/tmp-pinab-$(echo "$KEY" | tr , _)}
SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
mkdir -p "$OUT"

# --- pin worktree, compiled once and cached by commit
SHORT=$(git -C "$REPO" rev-parse --short "$PIN") || exit 1
WT=${PIN_AB_WORKTREE:-/root/wt-pin-$SHORT}
if [ ! -d "$WT" ]; then
  git -C "$REPO" worktree add --detach "$WT" "$PIN" || exit 1
fi
if [ ! -d "$WT/target/scala-2.13/classes/graft" ]; then
  echo "compiling pin tree $SHORT ..." | tee -a "$OUT/log.txt"
  (cd "$WT" && sbt -batch compile) >> "$OUT/log.txt" 2>&1 || exit 1
fi
# sbt compile does NOT copy src/main/resources — without the
# DataSourceRegister service file every format("lwes") key reads -1
# in the pin tree (the §6 gotcha that bit the r15 A/B)
if [ -d "$WT/src/main/resources" ]; then
  cp -r "$WT/src/main/resources/." "$WT/target/scala-2.13/classes/" || exit 1
fi
# HEAD classes must be current too — including the resources copy: a
# fresh/cleaned HEAD target has the same missing-service-file problem
# as a bare worktree, and would burn every head run on lwes keys
if [ "${PIN_AB_SKIP_HEAD_COMPILE:-}" != "1" ]; then
  (cd "$REPO" && sbt -batch compile) >> "$OUT/log.txt" 2>&1 || exit 1
fi
if [ -d "$REPO/src/main/resources" ]; then
  cp -r "$REPO/src/main/resources/." "$REPO/target/scala-2.13/classes/" || exit 1
fi

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_one() {
  local tree=$1 tag=$2
  echo "=== $tag loadavg: $(cat /proc/loadavg) $(date +%H:%M:%S)" >> "$OUT/log.txt"
  SPARK_GRAFT_SF_DIR="$SF_DIR" \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ITERS="$ITERS" \
  SPARK_GRAFT_BENCH_ONLY="$KEY" \
  SPARK_GRAFT_BENCH_OUT="$OUT/$tag.json" \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$tree/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench > "$OUT/$tag.stdout" 2>&1
  echo "=== $tag done rc=$? $(date +%H:%M:%S)" >> "$OUT/log.txt"
}

for i in $(seq 1 "$PAIRS"); do
  run_one "$REPO" "head_p$i"
  run_one "$WT" "pin_p$i"
done

python3 "$REPO/tools/pin_ab_summarize.py" "$OUT" "$KEY" "$SHORT" "$PAIRS"
