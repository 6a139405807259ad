#!/bin/bash
# Copy key run artifacts from gitignored logs/ into committed evidence/ so
# environment resets (which wipe logs/ and data/) cannot erase results.
# Run after any bench / pipeline / demo run; commit the result.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p evidence
copied=0
copy() { # copy <src> <dst-name>
  if [ -f "$1" ]; then
    cp "$1" "evidence/$2" && copied=$((copied + 1))
    echo "  + evidence/$2  (from $1, $(date -u +%FT%TZ))"
  fi
}
copy logs/bench_r5_snapshot.json bench_r5_snapshot.json
copy logs/bench_acc/eval.metric.json bench_acc_eval.json
copy logs/bench_acc/metrics.jsonl bench_acc_metrics.jsonl
for exp in lr5_pre lr5_final lr5d_pre lr5d_final ref_demo_r5; do
  copy "logs/$exp/eval_pre.json" "${exp}_eval_pre.json"
  copy "logs/$exp/eval_final.json" "${exp}_eval_final.json"
  copy "logs/$exp/eval.metric.json" "${exp}_eval_metric.json"
  copy "logs/$exp/eval_noisy_pre.json" "${exp}_eval_noisy_pre.json"
  copy "logs/$exp/eval_noisy_post.json" "${exp}_eval_noisy_post.json"
  copy "logs/$exp/traj.jsonl" "${exp}_traj.jsonl"
done
copy logs/ab_flop_diet_summary.json ab_flop_diet_summary.json
echo "collected $copied artifact(s) into evidence/"
