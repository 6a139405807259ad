#!/bin/bash
# Round-5 pipeline, phases 2b-3 redo with the contact deadzone.
#
# The first r5 attempt ran refinement at reference parity (contact_thres 0)
# and stage 1 dragged obj_scale 0.1000 -> 0.1184 along the scale<->depth
# valley (fit loss improved, so the do-no-harm guard kept it).  The frozen
# wrong scale then poisoned the final train: the object must sit ~18%
# deeper to match silhouettes, MRRPE climbed 41.6 -> 50.7 by step 12k and
# nothing recovered (logs/lr5_final_scale118/traj_partial.jsonl).  This
# redo enables the deadzone (--contact_thres 0.02, a documented deviation;
# the reference's own two-hand variant deadzones its contact, loss.py:135)
# and pins the refinement input to the clean 10k-step training checkpoint
# via --ckpt (the experiment's "latest" is the poisoned step_999000000).
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/pipeline_r5.log
CASE=bench_seq
export HOLD_NO_PROPOSAL=1
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

run_train_with_watchdog() {
  local watch=$1; shift
  while true; do
    wait_tpu
    stamp "launching: $*"
    "$@" & local TPID=$!
    echo $TPID > /tmp/lr5_final_train.pid
    touch "$watch"
    while kill -0 $TPID 2>/dev/null; do
      sleep 60
      local age=$(( $(date +%s) - $(stat -c %Y "$watch" 2>/dev/null || echo 0) ))
      if [ "$age" -gt 900 ]; then
        stamp "watchdog: $watch silent ${age}s — killing $TPID for relaunch"
        kill $TPID 2>/dev/null; sleep 10; kill -9 $TPID 2>/dev/null
        break
      fi
    done
    wait $TPID 2>/dev/null; local rc=$?
    if [ $rc -eq 0 ]; then stamp "train done"; return 0; fi
    stamp "train exited rc=$rc; relaunching (auto-resume)"
    sleep 30
  done
}

stamp "=== phase 2b REDO: refinement, frozen scale/shape + deadzone ==="
# --freeze_scale/--freeze_shape: stage 1's only signal on this
# well-registered synthetic is proxy-decimation bias (it inflated
# obj_scale to 0.1184 at parity and 0.1216 WITH the deadzone, both with
# improving fit loss).  Stage 2 (translations + object orientation, the
# params real SfM/HAMER inits get wrong) still runs in full.
wait_tpu
python -m hold_tpu.optimize_ckpt --exp logs/lr5_pre --case $CASE --no_vis \
  --ckpt logs/lr5_pre/checkpoints/step_000010000 --contact_thres 0.02 \
  --freeze_scale --freeze_shape \
  || { stamp "optimize_ckpt FAILED"; exit 1; }

stamp "=== phase 2c: evaluate post-refinement ==="
wait_tpu
python -m hold_tpu.evaluate --exp logs/lr5_pre --case $CASE \
  && cp logs/lr5_pre/eval.metric.json logs/lr5_pre/eval_postref.json

stamp "=== phase 3: final train 100 epochs (40k steps) with refined poses ==="
rm -rf logs/lr5_final
run_train_with_watchdog logs/lr5_final/train.log \
  python -m hold_tpu.train --case $CASE --num_epoch 100 --exp_key lr5_final \
  --load_pose logs/lr5_pre/checkpoints/step_999000000 --log_every 500

stamp "=== phase 3b: evaluate final ==="
wait_tpu
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

stamp "=== refinement demo ==="
wait_tpu
bash scripts/refinement_demo.sh
stamp "=== FLOP-diet A/B ==="
wait_tpu
bash scripts/ab_flop_diet.sh
stamp "=== bench snapshot ==="
wait_tpu
timeout 3000 python bench.py > logs/bench_r5_snapshot.json 2>logs/bench_r5_snapshot.err
stamp "=== r5b complete ==="
