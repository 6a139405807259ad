#!/bin/bash
# Round-5d: full three-phase pipeline + measurement queue, from a FRESH
# environment (the previous round-5 environment was reset; gitignored
# data/ and logs/ were lost, so every TPU artifact regenerates here).
#
# Flow (reference docs/usage.md:103-112): pretrain -> optimize_ckpt pose
# refinement -> final long train -> evaluate, then the refinement demo,
# the FLOP-diet accuracy A/B, and a bench snapshot, back to back.
#
# Round-5 changes under test (docs/pipeline.md):
#   - sampler conv_check="current" training default
#   - do-no-harm refinement guard + --freeze_scale/--freeze_shape +
#     contact deadzone (the r4 collapse trigger was the refined-pose init)
# Flagship run holds unvalidated perf knobs OFF (HOLD_NO_PROPOSAL=1).
#
# Every TPU step runs under a silence watchdog (the tunnel intermittently
# wedges; training is idempotent via auto-resume).
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/pipeline_r5d.log
CASE=bench_seq
export HOLD_NO_PROPOSAL=1
WDT=900
mkdir -p logs
exec >>"$LOG" 2>&1
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

tpu_ok() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); assert float((x@x).sum()) > 0" >/dev/null 2>&1
}
wait_tpu() {
  until tpu_ok; do stamp "TPU not answering; retry in 60s"; sleep 60; done
  stamp "TPU healthy"
}

run_wd() {
  local watch=$1 tries=$2; shift 2
  local n=0
  while [ $n -lt $tries ]; do
    n=$((n + 1))
    wait_tpu
    stamp "launch (attempt $n/$tries): $*  [watch $watch]"
    "$@" >>"$watch" 2>&1 & local TPID=$!
    touch "$watch"
    while kill -0 $TPID 2>/dev/null; do
      sleep 45
      local age=$(( $(date +%s) - $(stat -c %Y "$watch") ))
      if [ "$age" -gt "$WDT" ]; then
        stamp "watchdog: $watch silent ${age}s — killing $TPID"
        kill $TPID 2>/dev/null; sleep 10; kill -9 $TPID 2>/dev/null
        break
      fi
    done
    wait $TPID 2>/dev/null; local rc=$?
    if [ $rc -eq 0 ]; then stamp "step done (watch $watch)"; return 0; fi
    stamp "step rc=$rc; retrying"
    sleep 20
  done
  stamp "step FAILED after $tries attempts: $*"
  return 1
}

if [ ! -f data/$CASE/build/data.npy ]; then
  stamp "=== phase 0: generate $CASE ==="
  HOLD_PLATFORM=cpu python -m hold_tpu.data.synthetic --out ./data/$CASE \
    --frames 10 --height 240 --width 320 >>logs/step_0_data.log 2>&1 || exit 1
fi

stamp "=== phase 1: pretrain 25 epochs (10k steps) ==="
run_wd logs/lr5_pre_train_console.log 40 \
  python -m hold_tpu.train --case $CASE --num_epoch 25 --exp_key lr5_pre \
  --log_every 200 || exit 1

stamp "=== phase 2a: evaluate pretrain ==="
run_wd logs/step_2a.log 6 \
  python -m hold_tpu.evaluate --exp logs/lr5_pre --case $CASE \
  && cp logs/lr5_pre/eval.metric.json logs/lr5_pre/eval_pre.json

stamp "=== phase 2b: refinement (do-no-harm, frozen scale/shape, deadzone) ==="
run_wd logs/step_2b.log 6 \
  python -m hold_tpu.optimize_ckpt --exp logs/lr5_pre --case $CASE --no_vis \
  --ckpt logs/lr5_pre/checkpoints/step_000010000 --contact_thres 0.02 \
  --freeze_scale --freeze_shape || exit 1
tail -5 logs/step_2b.log

stamp "=== phase 2c: evaluate post-refinement ==="
run_wd logs/step_2c.log 6 \
  python -m hold_tpu.evaluate --exp logs/lr5_pre --case $CASE \
  && cp logs/lr5_pre/eval.metric.json logs/lr5_pre/eval_postref.json

stamp "=== phase 3: final train 100 epochs (40k steps), refined poses ==="
rm -rf logs/lr5_final
run_wd logs/lr5_final_train_console.log 60 \
  python -m hold_tpu.train --case $CASE --num_epoch 100 --exp_key lr5_final \
  --load_pose logs/lr5_pre/checkpoints/step_999000000 --log_every 500 \
  || exit 1

stamp "=== phase 3b: evaluate final ==="
run_wd logs/step_3b.log 6 \
  python -m hold_tpu.evaluate --exp logs/lr5_final --case $CASE \
  && cp logs/lr5_final/eval.metric.json logs/lr5_final/eval_final.json

stamp "=== pipeline summary ==="
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

stamp "=== refinement demo ==="
bash scripts/refinement_demo.sh
stamp "=== FLOP-diet A/B (trimmed: decisive variants) ==="
AB_VARIANTS="base prop prop_nb64_s4 full_diet" bash scripts/ab_flop_diet.sh
stamp "=== bench snapshot ==="
run_wd logs/bench_r5_snapshot.json 3 python bench.py
stamp "=== r5d complete ==="
bash scripts/collect_evidence.sh || true
