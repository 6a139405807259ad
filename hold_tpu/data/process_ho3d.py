"""HO3D v3 annotation preprocessing: raw per-frame meta pkl -> one npz.

Role parity with scripts/process_ho3d.py:25-179: walks a sequence's meta
folder, collects MANO pose (hand-mean removed), shape, translation, camera
K and object rigid poses, SLERP-fills invalid frames downstream, and writes
``<out>/processed/<seq>.npz`` consumed by hold_tpu.eval.gt_ho3d.

python -m hold_tpu.data.process_ho3d --ho3d_root <HO3D_v3/train> --seq ABF10 \
    --out ./generator/assets/ho3d_v3
"""

from __future__ import annotations

import argparse
import os
import os.path as op
import pickle

import numpy as np


def process_sequence(seq_dir: str, out_dir: str, seq_name: str,
                     hands_mean: np.ndarray) -> str:
    from ..utils.rot import axis_angle_to_matrix
    import jax.numpy as jnp

    meta_dir = op.join(seq_dir, "meta")
    rgb_dir = op.join(seq_dir, "rgb")
    frames = sorted(os.listdir(rgb_dir))

    recs = {
        "hand_pose": [], "hand_beta": [], "hand_transl": [],
        "obj_rot": [], "obj_trans": [], "is_valid": [], "K": [],
        "fnames": [],
    }
    obj_name = None
    for fname in frames:
        meta_p = op.join(meta_dir, op.splitext(fname)[0] + ".pkl")
        with open(meta_p, "rb") as f:
            d = pickle.load(f, encoding="latin1")
        obj_name = d.get("objName", obj_name)
        valid = (
            d.get("handPose") is not None
            and d.get("objTrans") is not None
            and d.get("handBeta") is not None
        )
        recs["is_valid"].append(1.0 if valid else 0.0)
        recs["fnames"].append(op.join(rgb_dir, fname))
        if valid:
            pose = np.asarray(d["handPose"], np.float32).reshape(-1)
            pose[3:] -= hands_mean  # store mean-removed like the reference
            recs["hand_pose"].append(pose)
            recs["hand_beta"].append(
                np.asarray(d["handBeta"], np.float32).reshape(-1)
            )
            recs["hand_transl"].append(
                np.asarray(d["handTrans"], np.float32).reshape(-1)
            )
            R = np.asarray(
                axis_angle_to_matrix(
                    jnp.asarray(d["objRot"], jnp.float32).reshape(1, 3)
                )
            )[0]
            recs["obj_rot"].append(R)
            recs["obj_trans"].append(
                np.asarray(d["objTrans"], np.float32).reshape(-1)
            )
            recs["K"].append(np.asarray(d["camMat"], np.float32))
        else:
            recs["hand_pose"].append(np.full(48, np.nan, np.float32))
            recs["hand_beta"].append(np.full(10, np.nan, np.float32))
            recs["hand_transl"].append(np.full(3, np.nan, np.float32))
            recs["obj_rot"].append(np.full((3, 3), np.nan, np.float32))
            recs["obj_trans"].append(np.full(3, np.nan, np.float32))
            recs["K"].append(np.full((3, 3), np.nan, np.float32))

    # nearest-valid infill of invalid frames (slerp.py role, simplified to
    # nearest-neighbour hold for GT packing; invalid frames stay masked out
    # of every metric via is_valid)
    valid_idx = np.where(np.asarray(recs["is_valid"]) > 0)[0]
    assert valid_idx.size, f"no valid frames in {seq_dir}"
    for key in ("hand_pose", "hand_beta", "hand_transl", "obj_rot",
                "obj_trans", "K"):
        arr = np.stack(recs[key])
        for i in range(arr.shape[0]):
            if not np.isfinite(arr[i]).all():
                j = valid_idx[np.argmin(np.abs(valid_idx - i))]
                arr[i] = arr[j]
        recs[key] = arr

    os.makedirs(op.join(out_dir, "processed"), exist_ok=True)
    out_p = op.join(out_dir, "processed", f"{seq_name}.npz")
    np.savez(
        out_p,
        hand_pose=recs["hand_pose"],
        hand_beta=recs["hand_beta"],
        hand_transl=recs["hand_transl"],
        obj_rot=recs["obj_rot"],
        obj_trans=recs["obj_trans"],
        K=recs["K"],
        is_valid=np.asarray(recs["is_valid"], np.float32),
        obj_name=obj_name or "",
        fnames=np.asarray(recs["fnames"]),
    )
    return out_p


def main():
    from ..mano.model_data import load_mano

    ap = argparse.ArgumentParser()
    ap.add_argument("--ho3d_root", required=True, help="HO3D_v3/train dir")
    ap.add_argument("--seq", required=True)
    ap.add_argument("--out", default="./generator/assets/ho3d_v3")
    args = ap.parse_args()

    hands_mean = load_mano(True).hands_mean
    p = process_sequence(
        op.join(args.ho3d_root, args.seq), args.out, args.seq, hands_mean
    )
    print(f"wrote {p}")


if __name__ == "__main__":
    main()
