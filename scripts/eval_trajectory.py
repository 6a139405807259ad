"""Evaluate every retained checkpoint of an experiment -> metric trajectory.

Diagnosis tool for the phase-3 quality regression (VERDICT r4 #1): runs the
standard offline evaluation (evaluate.run_evaluation) on each step_* ckpt
with the misc sidecar that existed at that step, and writes one JSONL line
per checkpoint.  Runs fine on CPU (pose tables + cached canonical meshes +
host ICP; no rendering), so it can sweep while the TPU trains.

Usage:
  HOLD_PLATFORM=cpu python scripts/eval_trajectory.py \
      --exp logs/lr4_final --case bench_seq --out logs/lr4_final/traj.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from glob import glob

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from hold_tpu.data.dataset import SequenceData  # noqa: E402
from hold_tpu.eval.io_pred import gt_from_sequence, load_data  # noqa: E402
from hold_tpu.evaluate import run_evaluation  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--case", required=True)
    ap.add_argument("--data_root", default="./data")
    ap.add_argument("--out", default=None)
    ap.add_argument("--icp_iters", type=int, default=600)
    ap.add_argument("--every", type=int, default=1,
                    help="evaluate every Nth checkpoint")
    args = ap.parse_args()

    out_p = args.out or os.path.join(args.exp, "traj.jsonl")
    seq = SequenceData(args.case, args.data_root)
    gt = gt_from_sequence(seq)

    ckpts = sorted(glob(os.path.join(args.exp, "checkpoints", "step_*")))
    ckpts = [c for c in ckpts if os.path.isdir(c)]
    ckpts = ckpts[:: args.every] + ([ckpts[-1]] if ckpts[-1] not in
                                    ckpts[:: args.every] else [])
    done_steps = set()
    if os.path.exists(out_p):
        with open(out_p) as f:
            for line in f:
                try:
                    done_steps.add(json.loads(line)["step"])
                except Exception:
                    pass

    for c in ckpts:
        step = int(os.path.basename(c).split("_")[1])
        if step in done_steps:
            continue
        t0 = time.time()
        pred = load_data(args.exp, seq, ckpt=c)
        mean_metrics, _ = run_evaluation(pred, gt, args.icp_iters)
        mean_metrics["step"] = step
        mean_metrics["eval_s"] = round(time.time() - t0, 1)
        with open(out_p, "a") as f:
            f.write(json.dumps(mean_metrics) + "\n")
        print(f"step {step}: " + " ".join(
            f"{k}={v:.3f}" for k, v in sorted(mean_metrics.items())
            if isinstance(v, float) and k != "eval_s"))


if __name__ == "__main__":
    main()
