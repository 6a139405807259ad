#!/bin/bash
# FLOP-diet accuracy A/B (VERDICT r4 #3): each perf knob must show eval
# parity on bench_seq before it becomes a default.  Four 2k-step fixed-seed
# trains + offline eval; rays/s read from the train logs.
#
#   base      : all knobs off (reference-faithful sampler, exact trunk)
#   prop      : distilled proposal net for table-building (default-on knob)
#   prop_nb   : + per-node ray-interval tightening (HOLD_NODE_BOUNDS=1)
#   prop_nb64 : + N_samples_eval 128->64 (confs/ab_eval64.yaml) — the
#               actual FLOP cut the tightened intervals pay for
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=logs/ab_flop_diet.log
CASE=bench_seq
mkdir -p logs
exec >>"$LOG" 2>&1
source scripts/wd.sh

# AB_VARIANTS (space-separated tags) restricts which variants run; the
# summary still reports every directory that exists.
WANT="${AB_VARIANTS:-}"

run_one() {
  local tag=$1; shift
  if [ -n "$WANT" ] && ! grep -qw "$tag" <<<"$WANT"; then
    stamp "skip $tag (AB_VARIANTS)"; return 0
  fi
  local envs=$1; shift
  local extra=$1; shift
  stamp "=== $tag: train 5 epochs (2k steps) env[$envs] args[$extra] ==="
  rm -rf logs/ab_$tag
  run_wd logs/ab_${tag}_console.log 10 \
    env $envs python -m hold_tpu.train --case $CASE --num_epoch 5 \
    --exp_key ab_$tag --log_every 500 --no_vis $extra \
    || { stamp "$tag train FAILED"; return 1; }
  run_wd logs/ab_${tag}_eval.log 6 \
    env $envs python -m hold_tpu.evaluate --exp logs/ab_$tag --case $CASE \
    || { stamp "$tag eval FAILED"; return 1; }
}

run_one base      "HOLD_NO_PROPOSAL=1" ""
run_one prop      "HOLD_DUMMY=0" ""
run_one prop_nb   "HOLD_NODE_BOUNDS=1" ""
run_one prop_nb64 "HOLD_NODE_BOUNDS=1" "--config confs/ab_eval64.yaml"
run_one prop_nb64_s4 "HOLD_NODE_BOUNDS=1 HOLD_SAMPLER_KNN_STRIDE=4" "--config confs/ab_eval64.yaml"
run_one prop_nb64r4_s4 "HOLD_NODE_BOUNDS=1 HOLD_SAMPLER_KNN_STRIDE=4" "--config confs/ab_eval64r4.yaml"
run_one full_diet "HOLD_NODE_BOUNDS=1 HOLD_SAMPLER_KNN_STRIDE=4" "--config confs/ab_full_diet.yaml"

stamp "=== summary ==="
python - <<'EOF'
import json, re, os
rows = []
for tag in ("base", "prop", "prop_nb", "prop_nb64", "prop_nb64_s4",
            "prop_nb64r4_s4", "full_diet"):
    d = f"logs/ab_{tag}"
    try:
        m = json.load(open(os.path.join(d, "eval.metric.json")))
    except Exception:
        rows.append((tag, None, None)); continue
    # steady-state rays/s: median of the last half of logged throughputs
    rates = []
    for line in open(os.path.join(d, "train.log")):
        g = re.search(r"\((\d+) rays/s\)", line)
        if g:
            rates.append(int(g.group(1)))
    rates = sorted(rates[len(rates)//2:])
    rps = rates[len(rates)//2] if rates else 0
    rows.append((tag, m, rps))
print(f"{'tag':10s} {'rays/s':>8s} {'cd_icp':>7s} {'f10':>6s} {'f5':>6s} "
      f"{'mpjpe':>6s}")
for tag, m, rps in rows:
    if m is None:
        print(f"{tag:10s} FAILED"); continue
    print(f"{tag:10s} {rps:8d} {m['cd_icp']:7.3f} {m['f10_icp']:6.1f} "
          f"{m['f5_icp']:6.1f} {m['mpjpe_ra_r']:6.2f}")
EOF
bash scripts/collect_evidence.sh || true
