#!/bin/bash
# Round-5 three-phase pipeline rerun (VERDICT r4 #1 done-criterion:
# eval_final >= eval_pre on CD_ICP / F10_ICP / F5).
#
# Same flow and step counts as pipeline_longrun.sh (reference
# docs/usage.md:103-112: pretrain -> optimize_ckpt -> final train ->
# evaluate), with the round-5 changes under test:
#   - sampler conv_check="current" training default (docs/pipeline.md: the
#     torch-parity-faithful "beta0" check measured consistently worse on
#     bench_seq — 10k pretrain CD_ICP 1.69 vs 0.66, logs/lr5_pre_beta0)
#   - do-no-harm refinement guard (fitting/fit.py)
# and the still-unvalidated perf knobs held OFF for this flagship run
# (proposal net off; node-bounds are opt-in and not set), so the only
# delta vs the successful lr5_nopose 40k run is the refined-pose init.
#
# Fresh dirs (lr5_pre / lr5_final): optimize_ckpt and evaluate load the
# LATEST checkpoint, and lr4_pre's latest is the r4 un-guarded refined one.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/pipeline_r5.log
CASE=bench_seq
export HOLD_NO_PROPOSAL=1
mkdir -p logs
exec >>"$LOG" 2>&1

stamp() { echo "[$(date +%H:%M:%S)] $*"; }

stamp "=== phase 1: pretrain 25 epochs (10k steps) ==="
python -m hold_tpu.train --case $CASE --num_epoch 25 --exp_key lr5_pre \
  --log_every 200 || { stamp "pretrain FAILED"; exit 1; }

stamp "=== phase 2a: evaluate pretrain ==="
python -m hold_tpu.evaluate --exp logs/lr5_pre --case $CASE \
  && cp logs/lr5_pre/eval.metric.json logs/lr5_pre/eval_pre.json

stamp "=== phase 2b: pose refinement (optimize_ckpt, do-no-harm) ==="
python -m hold_tpu.optimize_ckpt --exp logs/lr5_pre --case $CASE --no_vis \
  || { stamp "optimize_ckpt FAILED"; exit 1; }

stamp "=== phase 2c: evaluate post-refinement ==="
python -m hold_tpu.evaluate --exp logs/lr5_pre --case $CASE \
  && cp logs/lr5_pre/eval.metric.json logs/lr5_pre/eval_postref.json

stamp "=== phase 3: final train 100 epochs (40k steps) with refined poses ==="
python -m hold_tpu.train --case $CASE --num_epoch 100 --exp_key lr5_final \
  --load_pose logs/lr5_pre/checkpoints/step_999000000 --log_every 500 \
  || { stamp "final train FAILED"; exit 1; }

stamp "=== phase 3b: evaluate final ==="
python -m hold_tpu.evaluate --exp logs/lr5_final --case $CASE \
  && cp logs/lr5_final/eval.metric.json logs/lr5_final/eval_final.json

stamp "=== pipeline complete ==="
python - <<'EOF'
import json
rows = [("pre", "logs/lr5_pre/eval_pre.json"),
        ("postref", "logs/lr5_pre/eval_postref.json"),
        ("final", "logs/lr5_final/eval_final.json")]
vals = {}
for tag, p in rows:
    try:
        vals[tag] = json.load(open(p))
        print(tag, {k: round(v, 3) for k, v in vals[tag].items()
                    if isinstance(v, float)})
    except Exception as e:
        print(tag, "MISSING", e)
if "pre" in vals and "final" in vals:
    ok = (vals["final"]["cd_icp"] <= vals["pre"]["cd_icp"] + 0.05
          and vals["final"]["f10_icp"] >= vals["pre"]["f10_icp"] - 1.0
          and vals["final"]["f5_icp"] >= vals["pre"]["f5_icp"] - 1.0)
    print("DONE-CRITERION (final >= pre on CD_ICP/F10/F5):",
          "PASS" if ok else "FAIL")
EOF
