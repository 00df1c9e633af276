#!/bin/bash
# Round-7 same-epoch protocol (VERDICT r06 #4): Spark bench and DuckDB
# oracle bench, serial (never two engines concurrently — r6 lesson),
# multiple invocations per tier so per-row MEDIANS ACROSS invocations
# are citable (single sf10 invocations swing +/-50%).
set -u
cd /root/repo
OUT=${1:-/tmp/epoch_r7}
mkdir -p "$OUT"
for i in 1 2; do
  SPARK_GRAFT_SF_DIR=/root/repo/.testdata_sf1 python bench.py \
    >"$OUT/spark_sf1_$i.log" 2>&1
  echo "spark sf1 run $i done $(date +%T)"
done
for i in 1 2; do
  SPARK_GRAFT_SF_DIR=/root/repo/.testdata_sf1 python -m tools.bench_oracle \
    >"$OUT/duck_sf1_$i.log" 2>&1
  echo "duck sf1 run $i done $(date +%T)"
done
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/repo/.testdata_sf10 python bench.py \
    >"$OUT/spark_sf10_$i.log" 2>&1
  echo "spark sf10 run $i done $(date +%T)"
done
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/repo/.testdata_sf10 python -m tools.bench_oracle \
    >"$OUT/duck_sf10_$i.log" 2>&1
  echo "duck sf10 run $i done $(date +%T)"
done
echo EPOCH_TABLES_DONE
