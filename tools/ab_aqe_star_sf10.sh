#!/bin/bash
# Round-11 ABBA (VERDICT r10 #7): the one unmeasured lever on the
# q3/q5 sf10 floor — AQE coalesce + larger initial shuffle partitions
# tuned for the sf10 tier (bench default at sf10: shuffle=32, AQE
# off). A = shipped config; B = shuffle 128 + AQE on (runtime
# coalesce picks the effective count). ABBA order cancels slow drift;
# 60 s cool-downs between invocations; loadavg recorded.
set -u
cd /root/repo
OUT=${1:-/tmp/ab_aqe_star_r11}
ROWS="q3_star_join_topk,q5_multiway"
SF=/root/repo/.testdata_sf10
mkdir -p "$OUT"
run_a() {
  cat /proc/loadavg >"$OUT/load_$1"
  SPARK_GRAFT_SF_DIR=$SF SPARK_BENCH_ONLY=$ROWS \
    python bench.py >"$OUT/$1.log" 2>&1
}
run_b() {
  cat /proc/loadavg >"$OUT/load_$1"
  SPARK_GRAFT_SF_DIR=$SF SPARK_BENCH_ONLY=$ROWS \
    SPARK_SHUFFLE_PARTITIONS=128 SPARK_BENCH_AQE=true \
    python bench.py >"$OUT/$1.log" 2>&1
}
run_a A1; echo "A1 done $(date +%T)"; sleep 60
run_b B1; echo "B1 done $(date +%T)"; sleep 60
run_b B2; echo "B2 done $(date +%T)"; sleep 60
run_a A2; echo "A2 done $(date +%T)"
grep -h '"metric"' "$OUT"/A1.log "$OUT"/B1.log "$OUT"/B2.log "$OUT"/A2.log
echo AB_AQE_STAR_R11_DONE
