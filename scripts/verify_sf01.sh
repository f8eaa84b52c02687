#!/bin/bash
# Plan-sensitive oracle RE-verification at sf0.1 (10x the driver's
# correctness scale): AQE re-planning, window ties, approx within_band
# rows, and the index-maintenance rebuild equivalences are the queries
# whose behavior can shift with data volume — hash-verify them against
# the same DuckDB oracle at the bigger SF. The full 192-query gate
# stays at sf0.01 (the driver's contract); this is the volume-shift
# spot check. Usage: bash scripts/verify_sf01.sh [extra,names]
set -e
cd /root/repo
PLAN_SENSITIVE="llm_ivf_patch,llm_pq_patch,llm_bm25_layered,\
llm_kmeans_update,llm_cell_migration,llm_split_strat_approx,\
llm_quantile_gate_approx,llm_len_quantiles,llm_dedup_clusters,\
llm_dedup_clusters_dist,llm_cluster_split,llm_neardup_dedup,\
llm_windowed_trending,llm_hash_topk,llm_topk,llm_bm25,llm_rank_eval,\
llm_approx_stats,llm_privacy_audit,q27_rolling_range,\
q28_grouping_sets,q31_rate_anomaly,q34_star_topk,q38_antijoin"
ONLY="${1:-$PLAN_SENSITIVE}"
exec bash scripts/verify_local.sh /root/testdata/sf0.1 \
  /root/repo/target/verify_sf01 "$ONLY"
