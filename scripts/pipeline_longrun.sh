#!/bin/bash
# Production-length three-phase pipeline rehearsal on one TPU chip.
#
# Mirrors the reference's documented flow (docs/usage.md:103-112 there:
# pretrain -> pose refinement -> final long train -> evaluate), at step
# counts that cross every schedule milestone the short dev runs can't see:
#  - the 30k-step loss milestone (models/losses.py: w_sem 1.1->0.1,
#    w_sparse 0->1 over 30k; reference code/src/hold/loss.py:69-77)
#  - the epoch-20 cond un-zeroing (models/nodes.py; mano_node.py:84-85)
#  - BARF anneal completion (barf_e)
#
# Phase 1: pretrain 25 epochs = 10,000 steps (tempo_len 2000 / batch 5)
# Phase 2: evaluate -> eval_pre.json; optimize_ckpt (2-stage pose
#          refinement); evaluate -> eval_postref.json
# Phase 3: final train 100 epochs = 40,000 steps with --load_pose from the
#          refined checkpoint; evaluate -> eval_final.json
#
# Writes everything under logs/lr4_pre and logs/lr4_final; progress +
# timings to logs/pipeline_longrun.log.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/pipeline_longrun.log
CASE=bench_seq
mkdir -p logs
exec >>"$LOG" 2>&1

stamp() { echo "[$(date +%H:%M:%S)] $*"; }

stamp "=== phase 1: pretrain 25 epochs (10k steps) ==="
python -m hold_tpu.train --case $CASE --num_epoch 25 --exp_key lr4_pre \
  --log_every 200 || { stamp "pretrain FAILED"; exit 1; }

stamp "=== phase 2a: evaluate pretrain ==="
python -m hold_tpu.evaluate --exp logs/lr4_pre --case $CASE \
  && cp logs/lr4_pre/eval.metric.json logs/lr4_pre/eval_pre.json

stamp "=== phase 2b: pose refinement (optimize_ckpt) ==="
python -m hold_tpu.optimize_ckpt --exp logs/lr4_pre --case $CASE --no_vis \
  || { stamp "optimize_ckpt FAILED"; exit 1; }

stamp "=== phase 2c: evaluate post-refinement ==="
python -m hold_tpu.evaluate --exp logs/lr4_pre --case $CASE \
  && cp logs/lr4_pre/eval.metric.json logs/lr4_pre/eval_postref.json

stamp "=== phase 3: final train 100 epochs (40k steps) with refined poses ==="
python -m hold_tpu.train --case $CASE --num_epoch 100 --exp_key lr4_final \
  --load_pose logs/lr4_pre/checkpoints/step_999000000 --log_every 500 \
  || { stamp "final train FAILED"; exit 1; }

stamp "=== phase 3b: evaluate final ==="
python -m hold_tpu.evaluate --exp logs/lr4_final --case $CASE \
  && cp logs/lr4_final/eval.metric.json logs/lr4_final/eval_final.json

stamp "=== pipeline complete ==="
python - <<'EOF'
import json
for tag, p in [("pre", "logs/lr4_pre/eval_pre.json"),
               ("postref", "logs/lr4_pre/eval_postref.json"),
               ("final", "logs/lr4_final/eval_final.json")]:
    try:
        print(tag, json.load(open(p)))
    except Exception as e:
        print(tag, "MISSING", e)
EOF
