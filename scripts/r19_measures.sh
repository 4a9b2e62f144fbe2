#!/bin/bash
# Round-19 at-scale measurement runbook (record of what ran, in order,
# each on an otherwise-idle host; see SCALING.md r19 + BASELINE.md r19).
#
# 1. Shared-JVM sweep of the 134 pre-protocol carried entries with
#    per-entry control stamps (completion screen; values later shown
#    to carry within-JVM aging and superseded by step 3):
#      seed /tmp/board_r19.json with the 77 r18-isolated entries, then
#      GRAFT_CONTROL_QUERY=q_having_countd GRAFT_CONTROL_DIR=/root/testdata/sf0.01 \
#        python3 scripts/board_runner.py /tmp/testdata/sf100 \
#        /tmp/board_r19_out /tmp/board_r19.json /tmp/oracle_full.json
#
# 2. Solo fresh-JVM adjudication of the four entries that measured
#    ABOVE their carried values in step 1 (q_table_diff, q_lsh_ann,
#    q_ewma, q_json_extract): scripts/run_verify.sh-style single-query
#    graft.Verify, board flags, control-stamped. Result: 3-7x cheaper
#    than the shared pass -> the aging finding.
#
# 3. Fresh-JVM-per-query re-measure of ALL 134 entries (the recorded
#    protocol; equivalent to):
#      GRAFT_CONTROL_QUERY=q_having_countd GRAFT_CONTROL_DIR=/root/testdata/sf0.01 \
#        JVM_PER_QUERY=1 python3 scripts/board_runner.py /tmp/testdata/sf100 \
#        /tmp/out /tmp/board_r19_fresh.json /tmp/oracle_134.json
#    -> SCALE_SF100_r19.json (plus q_kcore re-measured on r19 HEAD
#       post peel-fusion: 428.9s vs 429.1s r18).
#
# 4. Aging-mechanism bounding experiments (SCALING.md r19):
#    a. 100-query shared pass at sf10, q_stats-on-sf10 control before
#       every entry, -XX:ReservedCodeCacheSize=512m then 2g, jcmd
#       Compiler.codecache/GC.heap_info snapshots: flat control curve
#       both ways, full_count=0 -> code cache + plan count exonerated.
#    b. 60-query shared rerun of sweep positions 35-95 at sf100:
#       0.66-0.81x fresh per quartile, flat controls -> a ~500s shared
#       pass does not age; the degradation needs the hour-plus
#       cumulative pass.
#
# 5. Invariance chain (fresh pair on r19 HEAD):
#      python3 scripts/make_sf1.py /root/testdata/sf0.1 /tmp/testdata/sf1.0_r19c 10 1251752960
#      scripts/run_verify.sh /root/testdata/sf0.1 /tmp/inv_r19_base "" 32 32g
#      scripts/run_verify.sh /tmp/testdata/sf1.0_r19c /tmp/inv_r19_x10b "" 32 96g
#      python3 scripts/invariance_report.py /tmp/inv_r19_base /tmp/inv_r19_x10b \
#        10 1251752960 INVARIANCE_r19.json sf0.1 sf1.0_r19
#    OFF MUST be 1251752960 (= 1024*244483*5): q_zorder gates on
#    OFF % 1024 == 0 and q_cdc_apply on OFF % 244483 == 0 - a 1e9
#    offset silently drops 20,485 checks (62,192 -> 41,707).
#
# 6. Bench windows: three full graft.Bench passes on r19 HEAD (best
#    222.71s raw at 1.18x controls -> ~189s normalized vs the 186.17s
#    floor), plus a probe-gated watcher that fires a pass only when a
#    cheap CPU probe reads < 1.05 - no sub-1.05 window appeared; the
#    control-normalized comparison is formalized in BASELINE.md r19.
