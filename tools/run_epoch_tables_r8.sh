#!/bin/bash
# Round-8 same-epoch protocol (r7's script + the new media_fits_decode
# row): serial engine runs, multiple invocations per tier. The fits
# row joins the sf0.1/sf1 tiers; at sf10 its DuckDB comparator unnests
# ~1.1B rows (~2.5 min/run — superlinear vs the data), so the sf10
# oracle tier excludes it the same way the near-dup class is excluded,
# and the Spark sf10 run keeps it (engine side stays linear).
set -u
cd /root/repo
OUT=${1:-/tmp/epoch_r8}
NOFITS="q1_pricing_summary,q3_star_join_topk,q5_multiway,window_topk_per_group,events_tumbling_1h,events_sessionize_30m,docs_wordcount,emb_cosine_knn,docs_dedup_exact,docs_tfidf,docs_winnow_fingerprints,docs_simhash_neardup,media_decode,docs_lm_score,docs_bm25_topk,emb_int8_quantize,events_retention_cohort,events_funnel,docs_boilerplate_5gram,events_mad_outliers,q6_revenue_uplift,q21_waiting_suppliers,emb_kmeans,emb_power_iteration_pc,docs_curation_funnel,events_ohlc_bars,events_wau_mau,events_interval_coverage,docs_bpe_merge"
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
  SPARK_GRAFT_SF_DIR=/root/repo/.testdata_sf10 SPARK_BENCH_ONLY="$NOFITS" \
    python -m tools.bench_oracle >"$OUT/duck_sf10_$i.log" 2>&1
  echo "duck sf10 run $i done $(date +%T)"
done
echo EPOCH_TABLES_DONE
