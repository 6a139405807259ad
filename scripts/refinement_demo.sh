#!/bin/bash
# Pose-refinement effectiveness demo under the REAL pipeline's condition:
# noisy pose initialization over clean video (data/synthetic.py --pose_noise).
#
# The lr4 pipeline rehearsal showed that refining an already-perfect
# synthetic init can only perturb it (eval_postref ~= eval_pre on ICP
# metrics, worse on pose metrics).  Here the init is noised (sigma = 0.1 rad
# on rotations, 5 mm on translations) while evaluation measures against the
# clean truth (entities_gt) — so optimize_ckpt's silhouette fitting has an
# actual error to remove, as it does on real HO3D/ARCTIC captures.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/refinement_demo.log
mkdir -p logs
exec >>"$LOG" 2>&1
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

CASE=noisy_seq
if [ ! -f data/$CASE/build/data.npy ]; then
  stamp "generating noised sequence"
  python -m hold_tpu.data.synthetic --out ./data/$CASE --frames 10 \
    --height 240 --width 320 --pose_noise 0.1
fi

stamp "=== short pretrain from the noised init ==="
python -m hold_tpu.train --case $CASE --num_epoch 6 --exp_key ref_demo \
  --log_every 200 || { stamp "pretrain FAILED"; exit 1; }

stamp "=== evaluate BEFORE refinement (vs clean truth) ==="
python -m hold_tpu.evaluate --exp logs/ref_demo --case $CASE \
  && cp logs/ref_demo/eval.metric.json logs/ref_demo/eval_noisy_pre.json

stamp "=== pose refinement ==="
python -m hold_tpu.optimize_ckpt --exp logs/ref_demo --case $CASE --no_vis \
  || { stamp "optimize_ckpt FAILED"; exit 1; }

stamp "=== evaluate AFTER refinement ==="
python -m hold_tpu.evaluate --exp logs/ref_demo --case $CASE \
  && cp logs/ref_demo/eval.metric.json logs/ref_demo/eval_noisy_post.json

stamp "=== demo summary ==="
python - <<'EOF'
import json
pre = json.load(open("logs/ref_demo/eval_noisy_pre.json"))
post = json.load(open("logs/ref_demo/eval_noisy_post.json"))
for k in sorted(pre):
    if isinstance(pre[k], float):
        print(f"{k:12s} pre {pre[k]:8.3f} -> post {post[k]:8.3f}")
EOF
