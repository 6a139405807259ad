#!/bin/bash
# Pose-refinement effectiveness demo under the REAL pipeline's condition:
# noisy pose initialization over clean video (data/synthetic.py --pose_noise).
#
# Round-5 redesign: the r4 demo (noisy_seq, --pose_noise_mode all) corrupted
# hand ARTICULATION, which refinement keeps frozen by design (ours and the
# reference's fitting.py:58-68) — so most of its pose error was unfixable
# and the free translation params were dragged by the scale<->depth-
# degenerate contact pull instead (eval_noisy_post30: cd_right 7.9->35).
# This demo corrupts only what refinement optimizes (hand translation,
# object rotation+translation: --pose_noise_mode trans) and enables the
# contact deadzone (--contact_thres, a documented opt-in deviation).
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/refinement_demo_r5.log
mkdir -p logs
exec >>"$LOG" 2>&1
source scripts/wd.sh

CASE=noisy_trans_seq
EXP=ref_demo_r5
if [ ! -f data/$CASE/build/data.npy ]; then
  stamp "generating trans-noised sequence"
  HOLD_PLATFORM=cpu python -m hold_tpu.data.synthetic --out ./data/$CASE \
    --frames 10 --height 240 --width 320 --pose_noise 0.25 \
    --pose_noise_mode trans
fi

stamp "=== short pretrain from the noised init ==="
run_wd logs/${EXP}_train_console.log 20 \
  python -m hold_tpu.train --case $CASE --num_epoch 6 --exp_key $EXP \
  --log_every 200 || { stamp "pretrain FAILED"; exit 1; }

stamp "=== evaluate BEFORE refinement (vs clean truth) ==="
run_wd logs/${EXP}_eval_pre.log 6 \
  python -m hold_tpu.evaluate --exp logs/$EXP --case $CASE \
  && cp logs/$EXP/eval.metric.json logs/$EXP/eval_noisy_pre.json

stamp "=== pose refinement ==="
run_wd logs/${EXP}_refine.log 6 \
  python -m hold_tpu.optimize_ckpt --exp logs/$EXP --case $CASE --no_vis \
  --contact_thres 0.02 \
  || { stamp "optimize_ckpt FAILED"; exit 1; }

stamp "=== evaluate AFTER refinement ==="
run_wd logs/${EXP}_eval_post.log 6 \
  python -m hold_tpu.evaluate --exp logs/$EXP --case $CASE \
  && cp logs/$EXP/eval.metric.json logs/$EXP/eval_noisy_post.json

stamp "=== demo summary ==="
python - <<'EOF'
import json
pre = json.load(open("logs/ref_demo_r5/eval_noisy_pre.json"))
post = json.load(open("logs/ref_demo_r5/eval_noisy_post.json"))
for k in sorted(pre):
    if isinstance(pre[k], float):
        print(f"{k:12s} pre {pre[k]:8.3f} -> post {post[k]:8.3f}")
EOF
bash scripts/collect_evidence.sh || true
