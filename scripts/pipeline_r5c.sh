#!/bin/bash
# Round-5 pipeline phases 2b-3 + measurement queue, tunnel-hang hardened.
#
# The TPU tunnel intermittently wedges (RPCs hang forever; the client
# process never recovers even after the tunnel heals — observed 17:34,
# 18:34, 18:43 today).  EVERY TPU step therefore runs under a watchdog:
# the step's own log must grow; >WDT seconds of silence kills the client
# and relaunches it once the device answers a probe again.  Training is
# idempotent via auto-resume; optimize_ckpt/evaluate/bench restart from
# scratch (each is <15 min of work).
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/pipeline_r5.log
CASE=bench_seq
export HOLD_NO_PROPOSAL=1
WDT=900
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

# run_wd <watchfile> <max_attempts> <cmd...>: run cmd with a silence
# watchdog on watchfile (stdout/stderr appended there too).
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
    if [ $rc -eq 0 ]; then stamp "step done: $1"; return 0; fi
    stamp "step rc=$rc; retrying"
    sleep 20
  done
  stamp "step FAILED after $tries attempts: $*"
  return 1
}

stamp "=== phase 2b REDO2: refinement, frozen scale/shape + deadzone ==="
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
run_wd logs/lr5_final_train_console.log 40 \
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
stamp "=== FLOP-diet A/B ==="
bash scripts/ab_flop_diet.sh
stamp "=== bench snapshot ==="
run_wd logs/bench_r5_snapshot.json 3 python bench.py
stamp "=== r5c complete ==="
