#!/bin/bash
# Round-9 sf10 tier: quiet-epoch re-measurement (VERDICT r8 task 1): identical row set to run_epoch_sf10_r8.sh
# plus a 120 s cool-down BEFORE each invocation — the first run
# diagnosed a settle-lag effect (an invocation launched seconds after
# a preceding heavy run measures 1.7-3x slow; 5 minutes later the same
# query reproduces r7 exactly). Protocol note recorded in BASELINE.md.
set -u
cd /root/repo
OUT=${1:-/tmp/epoch_r9}
SUBSET="q1_pricing_summary,q3_star_join_topk,q5_multiway,events_tumbling_1h,docs_wordcount,emb_cosine_knn,docs_dedup_exact,media_decode,docs_bm25_topk,emb_int8_quantize,events_retention_cohort,events_funnel,docs_boilerplate_5gram,events_mad_outliers,q6_revenue_uplift,q21_waiting_suppliers,docs_curation_funnel,events_wau_mau,events_interval_coverage,docs_bpe_merge"
mkdir -p "$OUT"
for i in 1 2 3; do
  sleep 120
  SPARK_GRAFT_SF_DIR=/root/repo/.testdata_sf10 SPARK_BENCH_ONLY="$SUBSET,media_fits_decode" \
    python bench.py >"$OUT/spark_sf10_$i.log" 2>&1
  echo "spark sf10 run $i done $(date +%T)"
done
for i in 1 2 3; do
  sleep 120
  SPARK_GRAFT_SF_DIR=/root/repo/.testdata_sf10 SPARK_BENCH_ONLY="$SUBSET" \
    python -m tools.bench_oracle >"$OUT/duck_sf10_$i.log" 2>&1
  echo "duck sf10 run $i done $(date +%T)"
done
echo SF10_R9_DONE
