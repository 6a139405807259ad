#!/bin/bash
# Round-5e: VERDICT r4 #1's prescribed A/B variant (a) — the 40k final
# train WITHOUT --load_pose, isolating refinement-init corruption from
# schedule effects.  The pre-reset round-5 run of this variant PASSED
# (CD_ICP 0.58 @40k, better than the 10k pretrain's 0.66) but its logs
# were lost in the environment reset; this regenerates the evidence.
#
# Waits for pipeline_r5d.sh (the demo/A-B/bench queue) to exit first so
# the one TPU chip is never contended.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/pipeline_r5e.log
CASE=bench_seq
export HOLD_NO_PROPOSAL=1
WDT=900
mkdir -p logs
exec >>"$LOG" 2>&1
source scripts/wd.sh

# wait for the r5d queue to finish (PID passed by the launcher; defaults to
# "no wait" when unset or already gone)
R5D_PID="${R5D_PID:-}"
while [ -n "$R5D_PID" ] && kill -0 "$R5D_PID" 2>/dev/null; do
  stamp "waiting for pipeline_r5d (pid $R5D_PID)"
  sleep 120
done

stamp "=== r5e: 40k final train, PRETRAIN poses (no --load_pose) ==="
rm -rf logs/lr5_nopose
run_wd logs/lr5_nopose_train_console.log 60 \
  python -m hold_tpu.train --case $CASE --num_epoch 100 --exp_key lr5_nopose \
  --log_every 500 || exit 1

stamp "=== r5e: evaluate ==="
run_wd logs/step_r5e_eval.log 6 \
  python -m hold_tpu.evaluate --exp logs/lr5_nopose --case $CASE \
  && cp logs/lr5_nopose/eval.metric.json logs/lr5_nopose/eval_final.json

stamp "=== r5e: summary vs pretrain ==="
python - <<'EOF'
import json
pre = json.load(open("logs/lr5_pre/eval_pre.json"))
fin = json.load(open("logs/lr5_nopose/eval_final.json"))
for k in sorted(pre):
    if isinstance(pre[k], float):
        print(f"{k:12s} pre {pre[k]:8.3f} -> nopose-final {fin[k]:8.3f}")
ok = (fin["cd_icp"] <= pre["cd_icp"] + 0.05
      and fin["f10_icp"] >= pre["f10_icp"] - 1.0
      and fin["f5_icp"] >= pre["f5_icp"] - 1.0)
print("DONE-CRITERION (nopose-final >= pre):", "PASS" if ok else "FAIL")
EOF
stamp "=== r5e complete ==="
