#!/bin/bash
# Round-8 sf10 tier: the r5-comparable 20-row subset (the near-dup/
# winnow rows' OUTPUT goes superlinear at sf10 — simhash emits 345.7 M
# pairs, killing the collect on spark.driver.maxResultSize and taking
# the DuckDB comparator quadratic — so BOTH engines run the same
# 20-row set, exactly r7's protocol). media_fits_decode joins the
# SPARK side only (its DuckDB comparator unnests ~1.1 B rows at sf10);
# its sf10 number is reported Spark-only in SCALE.md.
set -u
cd /root/repo
OUT=${1:-/tmp/epoch_r8}
SUBSET="q1_pricing_summary,q3_star_join_topk,q5_multiway,events_tumbling_1h,docs_wordcount,emb_cosine_knn,docs_dedup_exact,media_decode,docs_bm25_topk,emb_int8_quantize,events_retention_cohort,events_funnel,docs_boilerplate_5gram,events_mad_outliers,q6_revenue_uplift,q21_waiting_suppliers,docs_curation_funnel,events_wau_mau,events_interval_coverage,docs_bpe_merge"
mkdir -p "$OUT"
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/repo/.testdata_sf10 SPARK_BENCH_ONLY="$SUBSET,media_fits_decode" \
    python bench.py >"$OUT/spark_sf10_$i.log" 2>&1
  echo "spark sf10 run $i done $(date +%T)"
done
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/repo/.testdata_sf10 SPARK_BENCH_ONLY="$SUBSET" \
    python -m tools.bench_oracle >"$OUT/duck_sf10_$i.log" 2>&1
  echo "duck sf10 run $i done $(date +%T)"
done
echo SF10_DONE
