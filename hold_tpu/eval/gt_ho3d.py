"""HO3D v3 ground-truth loader (eval space).

Role parity with code/src/utils/io/gt.py: reads the processed per-sequence
annotation archive (see hold_tpu.data.process_ho3d), converts the MANO root
pose from OpenGL to OpenCV about the hand-root pivot (gt.py:64-82), runs the
JAX MANO layer for GT verts/joints, poses the scanned object model, and
derives the same root-relative eval quantities as the prediction loader.
"""

from __future__ import annotations

import os
import os.path as op
from glob import glob

import jax.numpy as jnp
import numpy as np

from ..eval.metrics import bbox_centers
from ..mano.lbs import lbs_forward, mano_full_pose
from ..mano.server import build_mano_server
from ..utils.databus import DataBus
from ..utils.mesh import load_obj
from ..utils.rot import axis_angle_to_matrix
from ..utils.transforms import cv2gl_mano


def hand_root_pivot(server, betas: np.ndarray) -> np.ndarray:
    """Rest root-joint location for the given shape (smplx get_T_hip role)."""
    c = server.consts
    v_shaped = np.asarray(c.v_template) + np.einsum(
        "l,mkl->mk", betas, np.asarray(c.shapedirs)
    )
    return np.asarray(c.J_regressor)[0] @ v_shaped


def load_data(
    full_seq_name: str,
    data_root: str = "./data",
    ho3d_root: str = "./generator/assets/ho3d_v3",
) -> DataBus:
    seq_name = full_seq_name.split("_")[1] if "_" in full_seq_name else full_seq_name
    proc_p = op.join(ho3d_root, "processed", f"{seq_name}.npz")
    d = np.load(proc_p, allow_pickle=True)

    hand_pose = np.asarray(d["hand_pose"], np.float32)  # (F, 48) GL
    hand_beta = np.asarray(d["hand_beta"], np.float32)
    hand_transl = np.asarray(d["hand_transl"], np.float32)
    obj_rot = np.asarray(d["obj_rot"], np.float32)  # (F, 3, 3)
    obj_trans = np.asarray(d["obj_trans"], np.float32)
    obj_name = str(d["obj_name"])
    is_valid = np.asarray(d["is_valid"], np.float32)

    # frame selection from the build's corres.txt (gt.py:51-59)
    corres_p = op.join(data_root, full_seq_name, "build", "corres.txt")
    if op.exists(corres_p):
        with open(corres_p) as f:
            sel = sorted(line.strip() for line in f if line.strip())
        fids = np.array([int(op.basename(s).split(".")[0]) for s in sel])
        hand_pose, hand_beta = hand_pose[fids], hand_beta[fids]
        hand_transl, obj_rot = hand_transl[fids], obj_rot[fids]
        obj_trans, is_valid = obj_trans[fids], is_valid[fids]

    n = hand_pose.shape[0]
    server = build_mano_server(True, hand_beta[0])

    # GL -> CV for the root about the rest root-joint pivot
    pivot = hand_root_pivot(server, hand_beta[0])
    rot_cv, transl_cv = cv2gl_mano(hand_pose[:, :3], hand_transl, pivot)

    full_pose = mano_full_pose(
        server.consts, jnp.asarray(rot_cv), jnp.asarray(hand_pose[:, 3:])
    )
    out_lbs = lbs_forward(server.consts, jnp.asarray(hand_beta), full_pose)
    v3d_h = np.asarray(out_lbs.vertices) + transl_cv[:, None]
    j3d_h = np.asarray(out_lbs.joints) + transl_cv[:, None]

    # object: scanned model posed by the (y/z-flipped) GT rigid transform
    mesh_p = op.join(ho3d_root, "models", obj_name, "textured_simple.obj")
    obj_mesh = load_obj(mesh_p)
    Rt = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    Rt[:, :3, :3] = obj_rot
    Rt[:, :3, 3] = obj_trans
    Rt[:, 1:3] *= -1  # GL -> CV (gt.py:108-111)
    v3d_o = (
        np.einsum("fij,nj->fni", Rt[:, :3, :3], obj_mesh.vertices)
        + Rt[:, None, :3, 3]
    )

    out = DataBus()
    out["v3d_c.right"] = v3d_h
    out["j3d_c.right"] = j3d_h
    out["v3d_c.object"] = v3d_o
    out["root.right"] = j3d_h[:, 0]
    out["j3d_ra.right"] = j3d_h - j3d_h[:, :1]
    out["root.object"] = bbox_centers(v3d_o)
    out["v3d_ra.object"] = v3d_o - out["root.object"][:, None, :]
    out["v3d_right.object"] = v3d_o - out["root.right"][:, None, :]
    out["faces"] = {
        "right": np.asarray(server.consts.faces),
        "object": obj_mesh.faces,
    }
    out["is_valid"] = is_valid
    return out
