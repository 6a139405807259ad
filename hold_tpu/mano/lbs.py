"""Linear blend skinning for MANO in pure JAX.

Functional re-derivation of the standard SMPL/MANO LBS pipeline that the
reference vendors at code/src/utils/external/lbs.py:139-382 (blend shapes,
Rodrigues, kinematic-chain rigid transforms, weighted skinning), expressed as
batched einsums that XLA maps onto the MXU.  The 16-joint kinematic chain is
unrolled statically (depth 3), so the whole forward is a single fused graph
with no data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .model_data import ManoModelData, TIP_VERTEX_IDS


class ManoConstants(NamedTuple):
    """Device-resident MANO tensors (a pytree; safe to close over under jit)."""

    v_template: jnp.ndarray  # (V, 3)
    shapedirs: jnp.ndarray  # (V, 3, 10)
    posedirs: jnp.ndarray  # (135, V*3)
    J_regressor: jnp.ndarray  # (J, V)
    lbs_weights: jnp.ndarray  # (V, J)
    hands_mean: jnp.ndarray  # (45,)
    parents: tuple  # static: (J,) python ints
    faces: np.ndarray  # static host-side (F, 3)
    is_rhand: bool


def constants_from_model(md: ManoModelData) -> ManoConstants:
    return ManoConstants(
        v_template=jnp.asarray(md.v_template),
        shapedirs=jnp.asarray(md.shapedirs),
        posedirs=jnp.asarray(md.posedirs),
        J_regressor=jnp.asarray(md.J_regressor),
        lbs_weights=jnp.asarray(md.lbs_weights),
        hands_mean=jnp.asarray(md.hands_mean),
        parents=tuple(int(p) for p in md.parents),
        faces=md.faces,
        is_rhand=md.is_rhand,
    )


def rodrigues(rot_vecs: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Batched axis-angle -> rotation matrix, (..., 3) -> (..., 3, 3).

    Matches the reference's `batch_rodrigues` numerics (norm of aa + 1e-8)."""
    angle = jnp.linalg.norm(rot_vecs + eps, axis=-1, keepdims=True)
    rot_dir = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1)
    K = K.reshape(rot_vecs.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=rot_vecs.dtype)
    return eye + sin * K + (1.0 - cos) * (K @ K)


def blend_shapes(betas: jnp.ndarray, shape_disps: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps)


def vertices2joints(J_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("bik,ji->bjk", vertices, J_regressor)


def batch_rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray, parents):
    """Kinematic chain: per-joint world transforms + skinning-relative A.

    rot_mats: (B, J, 3, 3); joints: (B, J, 3); parents: static tuple.
    Returns posed_joints (B, J, 3) and rel_transforms A (B, J, 4, 4) with
    A_j = [R_chain_j, t_chain_j - R_chain_j @ j_rest_j] (bottom row 0,0,0,1).
    """
    B, J = joints.shape[:2]
    rel = joints.at[:, 1:].add(-joints[:, [p for p in parents[1:]]])

    # local 4x4s
    T_local = jnp.zeros((B, J, 4, 4), dtype=joints.dtype)
    T_local = T_local.at[:, :, :3, :3].set(rot_mats)
    T_local = T_local.at[:, :, :3, 3].set(rel)
    T_local = T_local.at[:, :, 3, 3].set(1.0)

    chain = [T_local[:, 0]]
    for j in range(1, J):
        chain.append(chain[parents[j]] @ T_local[:, j])
    T_world = jnp.stack(chain, axis=1)  # (B, J, 4, 4)

    posed_joints = T_world[:, :, :3, 3]
    # subtract the rotated rest joint so A maps rest-pose points directly
    corr = jnp.einsum("bjmn,bjn->bjm", T_world[:, :, :3, :3], joints)
    A = T_world.at[:, :, :3, 3].add(-corr)
    return posed_joints, A


class LbsOutput(NamedTuple):
    vertices: jnp.ndarray  # (B, V, 3)
    joints: jnp.ndarray  # (B, 21, 3): 16 chain joints + 5 fingertip verts
    A: jnp.ndarray  # (B, J, 4, 4) per-bone skinning transforms
    weights: jnp.ndarray  # (B, V, J)
    v_posed: jnp.ndarray  # (B, V, 3) shaped + pose-corrected, pre-skinning


def lbs_forward(
    consts: ManoConstants,
    betas: jnp.ndarray,  # (B, 10)
    full_pose: jnp.ndarray,  # (B, 48) axis-angle incl. global orient
    pose_blend: bool = True,
) -> LbsOutput:
    B = full_pose.shape[0]
    J = len(consts.parents)

    v_shaped = consts.v_template[None] + blend_shapes(betas, consts.shapedirs)
    joints_rest = vertices2joints(consts.J_regressor, v_shaped)

    rot_mats = rodrigues(full_pose.reshape(B, J, 3))
    eye = jnp.eye(3, dtype=full_pose.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, -1)
    if pose_blend:
        pose_offsets = (pose_feature @ consts.posedirs).reshape(B, -1, 3)
        v_posed = v_shaped + pose_offsets
    else:
        v_posed = v_shaped

    posed_joints, A = batch_rigid_transform(rot_mats, joints_rest, consts.parents)

    W = jnp.broadcast_to(consts.lbs_weights[None], (B,) + consts.lbs_weights.shape)
    T = jnp.einsum("bvj,bjmn->bvmn", W, A)
    verts = (
        jnp.einsum("bvmn,bvn->bvm", T[:, :, :3, :3], v_posed) + T[:, :, :3, 3]
    )

    tips = verts[:, jnp.asarray(TIP_VERTEX_IDS)]
    joints21 = jnp.concatenate([posed_joints, tips], axis=1)
    return LbsOutput(verts, joints21, A, W, v_posed)


def mano_full_pose(
    consts: ManoConstants, global_orient: jnp.ndarray, hand_pose: jnp.ndarray
) -> jnp.ndarray:
    """full_pose = [global_orient, hand_pose + hands_mean] — matches the
    reference MANO layer with flat_hand_mean=False
    (code/src/utils/external/body_models.py:627-631)."""
    return jnp.concatenate(
        [global_orient, hand_pose + consts.hands_mean[None]], axis=-1
    )
