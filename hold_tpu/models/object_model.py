"""Rigid object model + server (JAX).

Functional equivalent of the reference's ObjectModel/ObjectServer
(code/src/model/obj/object_model.py:29-69, obj/server.py:8-16): composes
scene-scale, per-frame rigid pose, object scale and the SfM de-normalization
matrix onto the canonical (unit-normalized) SfM point cloud.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils.rot import axis_angle_to_matrix


class ObjectServerState(NamedTuple):
    v3d_cano: jnp.ndarray  # (N, 3) canonical (normalized) SfM points
    obj_scale: jnp.ndarray  # () learnable-elsewhere copy of initial scale
    denorm_mat: jnp.ndarray  # (4, 4) inverse normalization matrix


def build_object_server(
    pts_cano: np.ndarray, obj_scale: float, norm_mat: np.ndarray
) -> ObjectServerState:
    return ObjectServerState(
        v3d_cano=jnp.asarray(pts_cano, jnp.float32),
        obj_scale=jnp.asarray(float(obj_scale), jnp.float32),
        denorm_mat=jnp.asarray(np.linalg.inv(np.asarray(norm_mat)), jnp.float32),
    )


class ObjectServerOutput(NamedTuple):
    verts: jnp.ndarray  # (B, N, 3) posed canonical points in scene space
    obj_tfs: jnp.ndarray  # (B, 4, 4) full cano->scene transform


def object_server_forward(
    state: ObjectServerState,
    scene_scale: jnp.ndarray,  # (B,) or scalar
    transl: jnp.ndarray,  # (B, 3)
    rot_aa: jnp.ndarray,  # (B, 3) axis-angle
    obj_scale: jnp.ndarray | None = None,  # optional learnable override
) -> ObjectServerOutput:
    B = rot_aa.shape[0]
    s = jnp.broadcast_to(jnp.reshape(scene_scale, (-1,)), (B,))
    o_scale = state.obj_scale if obj_scale is None else obj_scale

    R = axis_angle_to_matrix(rot_aa)  # (B, 3, 3)
    # T = scale(s) @ [R|t] @ scale(obj) @ denorm   — composition order parity
    # with code/src/model/obj/object_model.py:46-63.
    rigid = (
        jnp.zeros((B, 4, 4))
        .at[:, :3, :3].set(R)
        .at[:, :3, 3].set(transl.reshape(B, 3))
        .at[:, 3, 3].set(1.0)
    )
    scale_mat = jnp.eye(4)[None] * s[:, None, None]
    scale_mat = scale_mat.at[:, 3, 3].set(1.0)
    obj_scale_mat = jnp.eye(4)[None] * o_scale
    obj_scale_mat = obj_scale_mat.at[:, 3, 3].set(1.0)
    obj_scale_mat = jnp.broadcast_to(obj_scale_mat, (B, 4, 4))

    T = scale_mat @ rigid @ obj_scale_mat @ state.denorm_mat[None]

    vh = jnp.concatenate(
        [state.v3d_cano, jnp.ones((state.v3d_cano.shape[0], 1))], axis=-1
    )
    out = jnp.einsum("bij,nj->bni", T, vh)
    verts = out[..., :3] / out[..., 3:4]
    return ObjectServerOutput(verts=verts, obj_tfs=T)


def object_deform(
    x: jnp.ndarray, tfs: jnp.ndarray, inverse: bool = False
) -> jnp.ndarray:
    """Rigid warp of points; inverse maps deformed -> canonical.

    (B, N, 3), (B, 4, 4) -> (B, N, 3).  Equivalent of
    code/src/model/obj/deformer.py:10-41 with a closed-form affine inverse.
    """
    from ..utils.transforms import inverse_affine4

    T = inverse_affine4(tfs) if inverse else tfs
    y = jnp.einsum("bij,bnj->bni", T[:, :3, :3], x) + T[:, None, :3, 3]
    return y
