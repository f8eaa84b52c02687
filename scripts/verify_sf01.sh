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
llm_approx_stats,llm_privacy_audit,llm_takedown,llm_takedown_bm25,\
llm_takedown_ivf,llm_takedown_pq,llm_takedown_cms,\
llm_takedown_preview,llm_takedown_expand,llm_layer_asof,\
llm_index_drift,llm_pq_drift,llm_ann_filtered,\
llm_epoch_order,llm_epoch_repeats,llm_training_order,\
llm_curriculum_order,\
llm_ivf_append,llm_pq_append,llm_retention,llm_rrf_indexed,\
llm_quality_clf,llm_quality_gate_apply,llm_gate_threshold,llm_fim,\
llm_bm25_pruned,llm_bm25_pruned_weighted,\
llm_jaccard_prefix,llm_jaccard_slabbed,\
llm_reweight_sample,llm_domain_reweight,\
llm_hard_negatives_ivf,q27_rolling_range,\
q28_grouping_sets,q31_rate_anomaly,q34_star_topk,q38_antijoin"
# `all` = every oracle query except the declared O(N^2) brute
# baselines (llm_jaccard_pairs / llm_embedding_pairs), whose DuckDB
# replays are quadratic; ~25 min at sf0.1. Recorded green round 12.
if [ "${1:-}" = "all" ]; then
  # enumerate the suite from the compiled classes (no Spark session,
  # no leftover artifacts needed — works on a clean checkout)
  sbt -batch compile > /tmp/sf01_compile.log 2>&1 \
    || { tail -30 /tmp/sf01_compile.log; exit 1; }
  java -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify --dump-oracles /root/repo/target/verify_sf01_names.json
  # brute set mirrors graft.Bench.bruteForceBaselines (Bench.scala:23)
  ONLY=$(python3 - <<'PYEOF'
import json
sql = json.load(open('/root/repo/target/verify_sf01_names.json'))
brutes = {'llm_jaccard_pairs', 'llm_embedding_pairs'}
print(','.join(sorted(n for n in sql if n not in brutes)))
PYEOF
)
else
  ONLY="${1:-$PLAN_SENSITIVE}"
fi
# scope label for the stamp: which slice of the suite this run proves
if [ "${1:-}" = "all" ]; then SCOPE="all"
elif [ -z "${1:-}" ]; then SCOPE="plan-sensitive"
else SCOPE="custom"; fi
# Capture the tree identity BEFORE the (long) sweep: the stamp must
# vouch for the tree the sweep actually RAN on. Recording HEAD after
# the ~65-min run would let a src/main commit landing mid-sweep be
# vouched for (it becomes an ancestor of the post-run HEAD and
# sweep_check passes, but the sweep verified the pre-commit tree).
HEAD_PRE=$(git rev-parse HEAD)
PORCELAIN_PRE=$(git status --porcelain -- src/main build.sbt)
bash scripts/verify_local.sh /root/testdata/sf0.1 \
  /root/repo/target/verify_sf01 "$ONLY"
# GREEN (set -e would have exited otherwise): write the committed
# sweep stamp — records WHICH tree the sf0.1 sweep verified, so the
# end-of-round check (scripts/sweep_check.sh) can prove mechanically
# that no plan-changing commit landed after the recorded sweep (the
# gap the r17 and r18 verdicts both flagged). `dirty` = src/main or
# build.sbt had uncommitted edits at sweep time → the stamp cannot
# vouch for any commit and sweep_check fails until a clean rerun.
HEAD_NOW=$(git rev-parse HEAD)
PORCELAIN_NOW=$(git status --porcelain -- src/main build.sbt)
if [ "$HEAD_NOW" != "$HEAD_PRE" ] \
   || [ "$PORCELAIN_NOW" != "$PORCELAIN_PRE" ]; then
  echo "SWEEP STAMP REFUSED: HEAD or src/main working state changed" \
       "during the sweep ($HEAD_PRE -> $HEAD_NOW) — the green run" \
       "verified the PRE-change tree; rerun on the final tree"
  exit 1
fi
if [ -n "$PORCELAIN_NOW" ]; then
  DIRTY=true
else
  DIRTY=false
fi
N_NAMES=$(echo "$ONLY" | tr ',' '\n' | grep -c .)
cat > VERIFY_SF01_STAMP.json <<EOF
{"head": "$HEAD_NOW", "dirty": $DIRTY, "scope": "$SCOPE",
 "n_queries": $N_NAMES, "utc": "$(date -u +%Y-%m-%dT%H:%M:%SZ)"}
EOF
echo "sweep stamp written: VERIFY_SF01_STAMP.json (head=$HEAD_NOW dirty=$DIRTY scope=$SCOPE n=$N_NAMES)"
