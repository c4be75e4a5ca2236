#!/bin/bash
# lwes-subset interleaved A/B (the full-suite A/B found non-lwes flat
# and the r13 tree's lwes keys broken by a missing DataSourceRegister
# resource — now fixed in the worktree classes dir).
set -u
OUT=/root/repo/tmp-ab-lwes
KEYS=lwes_attr_pushdown,lwes_col_mapping,lwes_compacted,lwes_dpp,lwes_event_filter,lwes_float_conv,lwes_frame_prune,lwes_from_binary,lwes_header_cols,lwes_infer,lwes_multi_event,lwes_partitioned,lwes_roundtrip_agg,lwes_seqfile,lwes_split_read,lwes_sql_ddl,lwes_stream_decontam,lwes_stream_dedup,lwes_stream_drain,lwes_stream_join,lwes_stream_keepbest,lwes_stream_keepbest_reconciled,lwes_stream_neardup,lwes_stream_sessions,lwes_time_prune
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
  SPARK_GRAFT_BENCH_ONLY="$KEYS" \
  SPARK_GRAFT_BENCH_OUT="$OUT/$tag.json" \
  java $ADD_OPENS -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$tree/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench > "$OUT/$tag.stdout" 2>&1
  echo "=== $tag done rc=$? $(date +%H:%M:%S)" >> "$OUT/log.txt"
}
for i in 1 2 3; do
  run_one /root/repo "head_p$i"
  run_one /root/wt-r13 "r13_p$i"
done
echo ALL_DONE >> "$OUT/log.txt"
