#!/bin/bash
# Round-9 scaling sweep (VERDICT r8 item 4): isolated sf0.1 -> sf1 rows for
# the round-8 continuation operators that have no sf1 measurement yet.
# One JVM per query, 3 passes, last timed (steady state) — the same
# methodology as bench/bench_r8_*_isolated.json.
set -u
QUERIES="${QUERIES:-stats_ab_lift stats_acf stats_anova_f stats_benford \
stats_chi2_independence stats_kaplan_meier stats_ks_two_sample \
stats_mann_whitney stats_qq_deciles stats_spearman ml_conformal_interval \
ml_nb_train ml_nb_apply ml_ridge_train ml_ridge_eval graph_copurchase_topk \
graph_bfs_layers graph_label_propagation graph_pagerank_types \
join_er_fellegi_sunter join_blocked_jaro profile_columns \
window_interval_merge window_rolling_regression agg_markov_transition \
events_rfm_scores window_skyline_2d timeseries_seasonal_decompose \
cohort_retention text_gram_novelty agg_wilson_ci window_abc_classify}"
for pair in "sf01:/root/testdata/sf0.1" "sf1:/root/repo/target/testdata/sf1"; do
  tag="${pair%%:*}"; dir="${pair#*:}"
  out="bench/bench_r9_cont_${tag}_isolated.json"
  tmp="/tmp/scaling_r9_${tag}.jsonl"
  : > "$tmp"
  for q in $QUERIES; do
    line=$(SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_REPEAT=3 \
      bash tools/run_bench.sh "$q" 2>/dev/null | grep '"metric"' | tail -1)
    echo "$q $line" >> "$tmp"
  done
  python3 - "$tmp" "$out" <<'EOF'
import json, sys
rows = {}
total = 0.0
for line in open(sys.argv[1]):
    q, js = line.split(" ", 1)
    d = json.loads(js)
    rows[q] = d["queries"][q]
    total += rows[q]
out = {"metric": "graft_bench_isolated_r9_cont", "value": round(total, 3),
       "unit": "sec", "queries": rows, "passes": 3, "isolated_jvm_per_query": True}
json.dump(out, open(sys.argv[2], "w"), indent=1, sort_keys=True)
print("wrote", sys.argv[2], len(rows), "queries", round(total, 1), "s")
EOF
done
