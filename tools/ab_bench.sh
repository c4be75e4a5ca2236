#!/bin/bash
# Interleaved full-suite bench A/B: HEAD (/root/repo) vs r13-close
# (/root/wt-r13, 4c3c1fd). Per the SURVEY §6 / §11 ritual: alternating
# runs, identical direct-java invocation (no sbt overhead), same env,
# loadavg recorded per run. Results land in $OUT/{head,r13}_pN.json.
set -u
OUT=${1:-/root/repo/tmp-ab}
PAIRS=${2:-3}
mkdir -p "$OUT"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_one() {
  local tree=$1 tag=$2
  echo "=== $tag  loadavg: $(cat /proc/loadavg)  $(date +%H:%M:%S)" >> "$OUT/log.txt"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ITERS=3 \
  SPARK_GRAFT_BENCH_OUT="$OUT/$tag.json" \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$tree/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench > "$OUT/$tag.stdout" 2>&1
  echo "=== $tag done rc=$? $(date +%H:%M:%S)" >> "$OUT/log.txt"
}
for i in $(seq 1 "$PAIRS"); do
  run_one /root/repo "head_p$i"
  run_one /root/wt-r13 "r13_p$i"
done
echo ALL_DONE >> "$OUT/log.txt"
