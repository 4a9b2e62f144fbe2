#!/bin/bash
# Round-18 at-scale re-measures on r18 HEAD, run SEQUENTIALLY with the
# host otherwise idle (the mechanized isolation protocol: board_runner
# and Bench now refuse/tag when a sibling graft JVM is alive).
#
# Entries:
#  1. q_copurchase            — the owed r16/r17 deliverable (isolated re-measure,
#                               now routed through the capped basket generator)
#  2. q_basket_profile        — the basket-width histogram at sf100 (new gate query)
#  3. q_span_dedup, q_dup_spans, q_contamination
#                             — shingle family re-run after the pinSer migration
#  4. q_triangle_sampled      — size-conditional barrier: sf100 branch must
#                               still engage and complete (r17 flags)
set -u
REPO=/root/repo
SF=/tmp/testdata/sf100
OUT=/tmp/r18_sf100_out
LOG=/tmp/r18_measures.log
ADD_OPENS=$(python3 - <<'EOF'
print(' '.join(f'--add-opens java.base/{p}=ALL-UNNAMED' for p in
 ['java.lang','java.lang.invoke','java.lang.reflect','java.io','java.net',
  'java.nio','java.util','java.util.concurrent','java.util.concurrent.atomic',
  'sun.nio.ch','sun.nio.cs','sun.security.action','sun.util.calendar']))
EOF
)

run() {  # name, extra JVM flags..., uses board-standard env otherwise
  local q=$1; shift
  rm -rf "$OUT"
  echo "== $q start $(date -u +%H:%M:%S)" >> "$LOG"
  SPARK_GRAFT_CPUS=32 GRAFT_SHUFFLE_PARTITIONS=${SHUF:-256} GRAFT_VERIFY_COALESCE=0 \
    java $ADD_OPENS -Xmx96g -XX:ReservedCodeCacheSize=512m \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC "$@" \
    -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "$SF" "$OUT" "$q" 2>&1 | grep "\[verify\]" >> "$LOG"
  echo "== $q end $(date -u +%H:%M:%S)" >> "$LOG"
}

: > "$LOG"
run q_copurchase
run q_basket_profile
# keep the histogram for SCALING.md before the next run wipes $OUT
python3 - <<'EOF' >> "$LOG"
import glob
import pyarrow.parquet as pq
t = pq.read_table(glob.glob("/tmp/r18_sf100_out/q_basket_profile/*.parquet"))
print("basket_profile:", t.to_pydict())
EOF
run q_span_dedup
run q_dup_spans
run q_contamination
SHUF=1024 run q_triangle_sampled \
  -Dspark.rdd.compress=true -Dspark.io.compression.codec=zstd \
  -Dspark.cleaner.periodicGC.interval=1min
rm -rf "$OUT"
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
