#!/bin/bash
# Recovery orchestrator after the TPU-tunnel hang at phase-3 step 13.5k:
# wait for the device to answer a trivial program, resume the final train
# (auto-resume from logs/lr5_final/checkpoints; --load_pose is skipped on
# resume by train.py), evaluate, then run the r5 queue (demo -> A/B ->
# bench).  The train gets a watchdog: if train.log goes silent >15 min the
# process is killed and relaunched (auto-resume makes this idempotent).
set -uo pipefail
cd "$(dirname "$0")/.."
exec >>logs/r5_orchestrator.log 2>&1
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
  # $1 = logfile to watch
  local watch=$1; shift
  while true; do
    wait_tpu
    stamp "launching: $*"
    "$@" & local TPID=$!
    echo $TPID > /tmp/lr5_final_train.pid
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

stamp "=== resume phase 3 (auto-resume from last checkpoint) ==="
run_train_with_watchdog logs/lr5_final/train.log \
  python -m hold_tpu.train --case bench_seq --num_epoch 100 \
  --exp_key lr5_final --load_pose logs/lr5_pre/checkpoints/step_999000000 \
  --log_every 500

stamp "=== phase 3b: evaluate final ==="
wait_tpu
python -m hold_tpu.evaluate --exp logs/lr5_final --case bench_seq \
  && cp logs/lr5_final/eval.metric.json logs/lr5_final/eval_final.json

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
stamp "=== orchestrator complete ==="
