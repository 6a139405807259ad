"""MANO "server": canonical-space bookkeeping + posed forward, pure JAX.

Covers the reference's GenericServer/MANOServer (code/src/model/mano/server.py)
as a functional pair: `build_mano_server` precomputes the canonical ("DA
pose") state once on host, `mano_server_forward` is the per-step posed forward
used inside the jitted train step.

Canonical convention (parity with code/src/model/mano/server.py:11-17):
the canonical pose parameter is minus the hand mean, which after the MANO
layer's +hands_mean offset yields an exactly flat (zero) full pose.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .lbs import ManoConstants, lbs_forward, mano_full_pose
from .model_data import load_mano
from .lbs import constants_from_model


class ManoServerState(NamedTuple):
    consts: ManoConstants
    betas: jnp.ndarray  # (10,)
    verts_c: jnp.ndarray  # (1, V, 3) canonical verts
    joints_c: jnp.ndarray  # (1, 21, 3)
    tfs_c_inv: jnp.ndarray  # (J, 4, 4)
    skin_weights_c: jnp.ndarray  # (1, V, J)


def build_mano_server(
    is_rhand: bool, betas, model_dir: str | None = None
) -> ManoServerState:
    consts = constants_from_model(load_mano(is_rhand, model_dir))
    betas = jnp.asarray(betas, jnp.float32).reshape(1, -1)

    # canonical: scale=1, transl=0, hand pose = -hands_mean (flat after offset)
    cano_pose = jnp.concatenate(
        [jnp.zeros((1, 3)), -consts.hands_mean[None]], axis=-1
    )
    full_pose = mano_full_pose(consts, cano_pose[:, :3], cano_pose[:, 3:])
    out = lbs_forward(consts, betas, full_pose)
    tfs_c = out.A[0]  # (J, 4, 4); identity for the flat pose, kept general
    # rigid inverse per bone
    R = tfs_c[:, :3, :3]
    t = tfs_c[:, :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    tfs_c_inv = (
        jnp.zeros_like(tfs_c)
        .at[:, :3, :3].set(Rt)
        .at[:, :3, 3].set(-jnp.einsum("jmn,jn->jm", Rt, t))
        .at[:, 3, 3].set(1.0)
    )
    return ManoServerState(
        consts=consts,
        betas=betas[0],
        verts_c=out.vertices,
        joints_c=out.joints,
        tfs_c_inv=tfs_c_inv,
        skin_weights_c=out.weights,
    )


class ManoServerOutput(NamedTuple):
    verts: jnp.ndarray  # (B, V, 3) scene-scaled, translated
    jnts: jnp.ndarray  # (B, 21, 3)
    tfs: jnp.ndarray  # (B, J, 4, 4) bone tfs relative to canonical
    v_posed: jnp.ndarray  # (B, V, 3) canonical-space pose-corrected verts


def mano_server_forward(
    state: ManoServerState,
    scene_scale: jnp.ndarray,  # (B,) or scalar
    transl: jnp.ndarray,  # (B, 3)
    thetas: jnp.ndarray,  # (B, 48) global orient + 45 hand pose
    betas: jnp.ndarray,  # (B, 10)
    absolute: bool = False,
) -> ManoServerOutput:
    """Posed MANO forward in scene coordinates.

    Mirrors code/src/model/mano/server.py:62-99: the MANO layer runs without
    translation, then verts/joints/bone-tfs are scaled by the scene scale and
    shifted by scale*transl; bone tfs are made relative to the canonical pose.
    """
    full_pose = mano_full_pose(state.consts, thetas[:, :3], thetas[:, 3:])
    out = lbs_forward(state.consts, betas, full_pose)

    s = jnp.reshape(scene_scale, (-1, 1, 1))
    t = jnp.reshape(transl, (-1, 1, 3))
    verts = out.vertices * s + t * s
    jnts = out.joints * s + t * s

    tfs = out.A
    tfs = tfs.at[:, :, :3, :].multiply(s[..., None])
    tfs = tfs.at[:, :, :3, 3].add(t * s)
    if not absolute:
        tfs = jnp.einsum("bnij,njk->bnik", tfs, state.tfs_c_inv)
    return ManoServerOutput(verts=verts, jnts=jnts, tfs=tfs, v_posed=out.v_posed)
