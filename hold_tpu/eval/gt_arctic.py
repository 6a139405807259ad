"""ARCTIC ground truth: articulated-object layer + GT loader (eval space).

Role parity with common/object_tensors.py:34-293 (two-part object with a
z-axis articulation between top and bottom) and code/src/utils/io/
gt_arctic.py:22-60 (ioi_offset frame mapping into the capture).  Consumes a
packed npz produced by hold_tpu.data.process_arctic-style preprocessing:
{obj_verts_top, obj_verts_bottom, obj_arti (F,), obj_rot (F,3), obj_trans
(F,3), mano params per hand, world2cam (F,4,4), K, ioi_offset, is_valid}.
"""

from __future__ import annotations

import os.path as op

import jax.numpy as jnp
import numpy as np

from ..eval.metrics import bbox_centers
from ..mano.lbs import lbs_forward, mano_full_pose
from ..mano.server import build_mano_server
from ..utils.databus import DataBus
from ..utils.rot import axis_angle_to_matrix


def arctic_object_forward(
    verts_top: np.ndarray,  # (Vt, 3) canonical top part
    verts_bottom: np.ndarray,  # (Vb, 3)
    arti: np.ndarray,  # (F,) articulation angle about +z
    rot_aa: np.ndarray,  # (F, 3) global orientation
    trans: np.ndarray,  # (F, 3)
) -> np.ndarray:
    """(F, Vt+Vb, 3): top part rotated by -arti about z, then global rigid
    (ObjectTensors.forward semantics)."""
    F = arti.shape[0]
    ca, sa = np.cos(-arti), np.sin(-arti)
    Rz = np.zeros((F, 3, 3))
    Rz[:, 0, 0], Rz[:, 0, 1] = ca, -sa
    Rz[:, 1, 0], Rz[:, 1, 1] = sa, ca
    Rz[:, 2, 2] = 1.0
    top = np.einsum("fij,vj->fvi", Rz, verts_top)
    bottom = np.broadcast_to(verts_bottom[None], (F,) + verts_bottom.shape)
    full = np.concatenate([top, bottom], axis=1)
    R = np.asarray(axis_angle_to_matrix(jnp.asarray(rot_aa, jnp.float32)))
    return np.einsum("fij,fvj->fvi", R, full) + trans[:, None]


def load_data(full_seq_name: str,
              arctic_root: str = "./generator/assets/arctic") -> DataBus:
    proc = np.load(
        op.join(arctic_root, "processed", f"{full_seq_name}.npz"),
        allow_pickle=True,
    )
    n = int(proc["obj_arti"].shape[0])
    out = DataBus()
    faces = {}

    for side in ("right", "left"):
        key = f"{side}_pose"
        if key not in proc:
            continue
        poses = np.asarray(proc[key], np.float32)  # (F, 48)
        betas = np.asarray(proc[f"{side}_shape"], np.float32)
        transl = np.asarray(proc[f"{side}_transl"], np.float32)
        srv = build_mano_server(side == "right", betas[0] if betas.ndim > 1 else betas)
        full = mano_full_pose(
            srv.consts, jnp.asarray(poses[:, :3]), jnp.asarray(poses[:, 3:])
        )
        b = jnp.asarray(betas if betas.ndim > 1 else np.tile(betas, (n, 1)))
        o = lbs_forward(srv.consts, b, full)
        v = np.asarray(o.vertices) + transl[:, None]
        j = np.asarray(o.joints) + transl[:, None]
        # world -> camera per frame
        w2c = np.asarray(proc["world2cam"], np.float32)
        v = np.einsum("fij,fvj->fvi", w2c[:, :3, :3], v) + w2c[:, None, :3, 3]
        j = np.einsum("fij,fvj->fvi", w2c[:, :3, :3], j) + w2c[:, None, :3, 3]
        out[f"v3d_c.{side}"] = v
        out[f"j3d_c.{side}"] = j
        out[f"root.{side}"] = j[:, 0]
        out[f"j3d_ra.{side}"] = j - j[:, :1]
        faces[side] = np.asarray(srv.consts.faces)

    v_o = arctic_object_forward(
        np.asarray(proc["obj_verts_top"], np.float32),
        np.asarray(proc["obj_verts_bottom"], np.float32),
        np.asarray(proc["obj_arti"], np.float32),
        np.asarray(proc["obj_rot"], np.float32),
        np.asarray(proc["obj_trans"], np.float32),
    )
    w2c = np.asarray(proc["world2cam"], np.float32)
    v_o = np.einsum("fij,fvj->fvi", w2c[:, :3, :3], v_o) + w2c[:, None, :3, 3]
    out["v3d_c.object"] = v_o
    out["root.object"] = bbox_centers(v_o)
    out["v3d_ra.object"] = v_o - out["root.object"][:, None, :]
    for side in ("right", "left"):
        if f"root.{side}" in out:
            out[f"v3d_{side}.object"] = (
                v_o - out[f"root.{side}"][:, None, :]
            )
    faces["object"] = np.asarray(
        proc["obj_faces"] if "obj_faces" in proc else np.zeros((0, 3), np.int64)
    )
    out["faces"] = faces
    out["is_valid"] = np.asarray(
        proc["is_valid"] if "is_valid" in proc else np.ones(n), np.float32
    )
    return out
