"""Evaluation entry point: python -m hold_tpu.evaluate --exp <logs/key> --case <seq>.

Metric registry + output format parity with code/evaluate.py:9-90:
{mpjpe_ra_r, mrrpe_ho, cd_f_ra, cd_f_right, icp} -> mean JSON
(<exp>/eval.metric.json) + per-frame npy (<exp>/eval.metric_all.npy).
"""

from __future__ import annotations

import argparse
import json
import os
from datetime import datetime

import numpy as np

from .data.dataset import SequenceData
from .eval.icp import compute_icp_metrics
from .eval.metrics import mpjpe_ra, mrrpe, per_frame_chamfer_f


def eval_mpjpe_right(pred, gt, md):
    md["mpjpe_ra_r"] = mpjpe_ra(
        pred["j3d_ra.right"], gt["j3d_ra.right"], gt["is_valid"]
    )
    return md


def eval_mrrpe_ho(pred, gt, md):
    md["mrrpe_ho"] = mrrpe(
        gt["j3d_c.right"][:, 0], gt["root.object"],
        pred["j3d_c.right"][:, 0], pred["root.object"], gt["is_valid"],
    )
    return md


def eval_cd_f_ra(pred, gt, md):
    cd, f5, f10 = per_frame_chamfer_f(
        pred["v3d_ra.object"], gt["v3d_ra.object"], gt["is_valid"]
    )
    md["cd_ra"], md["f5_ra"], md["f10_ra"] = cd, f5, f10
    return md


def eval_cd_f_right(pred, gt, md):
    cd, f5, f10 = per_frame_chamfer_f(
        pred["v3d_right.object"], gt["v3d_right.object"], gt["is_valid"]
    )
    md["cd_right"], md["f5_right"], md["f10_right"] = cd, f5, f10
    return md


def eval_icp_first_frame(pred, gt, md, num_iters=600):
    cd, f5, f10 = compute_icp_metrics(
        gt["v3d_ra.object"][0], gt["faces"]["object"],
        pred["v3d_ra.object"][0], pred["faces"]["object"],
        num_iters=num_iters,
    )
    md["cd_icp"] = cd
    md["f5_icp"] = f5 * 100.0
    md["f10_icp"] = f10 * 100.0
    return md


def eval_icp_every_frame(pred, gt, md, num_iters=10):
    """Per-frame ICP-aligned CD/F (reference eval_modules.py:75-118): align
    every valid frame's predicted object against its GT with a SHORT ICP
    (10 iters there) and nanmean the per-frame metrics.  Not in the default
    registry (same as the reference) — opt in via --icp_every_frame."""
    n = len(pred["v3d_ra.object"])
    # length guards mirroring the reference (eval_modules.py:86-87): a
    # pred/gt frame-count mismatch must fail loudly, not nanmean misaligned
    # frames
    assert len(gt["v3d_ra.object"]) == n, (
        f"pred/gt frame mismatch: {n} vs {len(gt['v3d_ra.object'])}"
    )
    valid = np.asarray(gt["is_valid"]).astype(bool)
    assert len(valid) == n, f"is_valid length {len(valid)} != {n}"
    cds, f5s, f10s = [], [], []
    for i in range(n):
        if valid[i]:
            cd, f5, f10 = compute_icp_metrics(
                gt["v3d_ra.object"][i], gt["faces"]["object"],
                pred["v3d_ra.object"][i], pred["faces"]["object"],
                num_iters=num_iters,
            )
        else:
            cd = f5 = f10 = float("nan")
        cds.append(cd)
        f5s.append(f5)
        f10s.append(f10)
    md["cd_icp"] = float(np.nanmean(cds))
    md["f5_icp"] = float(np.nanmean(f5s)) * 100.0
    md["f10_icp"] = float(np.nanmean(f10s)) * 100.0
    return md


EVAL_FN_DICT = {
    "mpjpe_ra_r": eval_mpjpe_right,
    "mrrpe_ho": eval_mrrpe_ho,
    "cd_f_ra": eval_cd_f_ra,
    "cd_f_right": eval_cd_f_right,
}


def run_evaluation(pred, gt, icp_iters: int = 600,
                   icp_every_frame: bool = False) -> tuple[dict, dict]:
    metric_dict: dict = {}
    for name, fn in EVAL_FN_DICT.items():
        try:
            metric_dict = fn(pred, gt, metric_dict)
        except KeyError as e:
            print(f"[eval] skipping {name}: missing {e}")
    if pred["faces"]["object"].shape[0] > 0 and \
       gt["faces"]["object"].shape[0] > 0:
        if icp_every_frame:
            metric_dict = eval_icp_every_frame(pred, gt, metric_dict)
        else:
            metric_dict = eval_icp_first_frame(pred, gt, metric_dict,
                                               icp_iters)
    mean_metrics = {
        k: float(np.nanmean(v)) for k, v in sorted(metric_dict.items())
    }
    return mean_metrics, metric_dict


def main():
    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # every CLI pays remote TPU compiles otherwise
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True, help="experiment dir (logs/<key>)")
    ap.add_argument("--ckpt", default=None,
                    help="explicit checkpoint path (default: newest; the "
                    "reference's --sd_p/--ckpt_p role)")
    ap.add_argument("--out_json", default=None,
                    help="metrics JSON path (default <exp>/eval.metric.json)")
    ap.add_argument("--case", required=True)
    ap.add_argument("--data_root", default="./data")
    ap.add_argument("--gt", default="synthetic",
                    choices=["synthetic", "ho3d"],
                    help="ground-truth source")
    ap.add_argument("--icp_iters", type=int, default=600)
    ap.add_argument("--icp_every_frame", action="store_true",
                    help="per-frame short-ICP variant (eval_modules.py:75)")
    args = ap.parse_args()

    from .eval.io_pred import gt_from_sequence, load_data

    seq = SequenceData(args.case, args.data_root)
    pred = load_data(args.exp, seq, ckpt=args.ckpt)
    if args.gt == "synthetic":
        gt = gt_from_sequence(seq)
    else:
        from .eval.gt_ho3d import load_data as load_gt_ho3d

        gt = load_gt_ho3d(args.case, args.data_root)

    mean_metrics, metric_dict = run_evaluation(
        pred, gt, args.icp_iters, icp_every_frame=args.icp_every_frame)
    for k, v in mean_metrics.items():
        print(f"{k.upper()}: {v:.2f}")

    mean_metrics["timestamp"] = datetime.now().strftime("%m-%d %H:%M")
    mean_metrics["seq_name"] = args.case
    json_p = args.out_json or os.path.join(args.exp, "eval.metric.json")
    with open(json_p, "w") as f:
        json.dump(mean_metrics, f, indent=2)
    np.save(os.path.join(args.exp, "eval.metric_all.npy"), metric_dict)
    print(f"wrote {json_p}")


if __name__ == "__main__":
    main()
