"""Per-frame MANO registration: fit pose/shape to predicted hand meshes.

JAX port of the generator's registration stage (generator/scripts/
register_mano.py:28-153 + generator/src/hand_pose/registration.py:40-357):
given per-frame vertex predictions from an external hand estimator
(HAMER/METRO v3d.npy), fit MANO parameters in two stages —
coarse (global orient + translation) then fine (pose + shape) — with vertex,
edge-length and fingertip losses, warm-starting each frame from the previous
one.  Frames whose fit error is an outlier get NaN parameters for the SLERP
infill stage (slerp.py role).

All frames fit in parallel on the accelerator (the reference loops frames on
GPU one at a time); the warm start becomes an initialization from the
previous frame's solution after a first parallel pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..mano.lbs import lbs_forward, mano_full_pose
from ..mano.model_data import TIP_VERTEX_IDS
from ..mano.server import build_mano_server


def edge_lengths(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    v0 = verts[:, faces[:, 0]]
    v1 = verts[:, faces[:, 1]]
    v2 = verts[:, faces[:, 2]]
    return jnp.stack(
        [
            jnp.linalg.norm(v1 - v0, axis=-1),
            jnp.linalg.norm(v2 - v1, axis=-1),
            jnp.linalg.norm(v0 - v2, axis=-1),
        ],
        axis=-1,
    )


def fit_mano_to_verts(
    target_verts: np.ndarray,  # (F, 778, 3) predicted hand meshes
    is_rhand: bool = True,
    coarse_iters: int = 400,
    fine_iters: int = 400,
    lr: float = 1e-2,
    w_edge: float = 10.0,
    w_tip: float = 5.0,
    w_beta: float = 1e-3,
    model_dir: str | None = None,
):
    """Returns dict(poses (F,48), betas (10,), transl (F,3), vert_err (F,))."""
    server = build_mano_server(is_rhand, np.zeros(10), model_dir)
    consts = server.consts
    F = target_verts.shape[0]
    target = jnp.asarray(target_verts, jnp.float32)
    faces = jnp.asarray(consts.faces)
    tips = jnp.asarray(TIP_VERTEX_IDS)

    def forward(p):
        full_pose = mano_full_pose(consts, p["global_orient"], p["pose"])
        out = lbs_forward(
            consts, jnp.broadcast_to(p["betas"], (F, 10)), full_pose
        )
        return out.vertices + p["transl"][:, None]

    def losses(p, fine: bool):
        v = forward(p)
        l_vert = jnp.mean(jnp.sum((v - target) ** 2, -1))
        l_edge = jnp.mean(
            (edge_lengths(v, faces) - edge_lengths(target, faces)) ** 2
        )
        l_tip = jnp.mean(jnp.sum((v[:, tips] - target[:, tips]) ** 2, -1))
        l_beta = jnp.sum(p["betas"] ** 2)
        loss = l_vert + w_tip * l_tip
        if fine:
            loss = loss + w_edge * l_edge + w_beta * l_beta
        return loss

    def make_stage(trainable: set, fine: bool):
        def label(tree):
            return {k: ("free" if k in trainable else "frozen") for k in tree}

        def init_tx(p):
            return optax.multi_transform(
                {"free": optax.adam(lr), "frozen": optax.set_to_zero()},
                label(p),
            )

        @jax.jit
        def step(p, state):
            tx = init_tx(p)
            loss, grads = jax.value_and_grad(lambda q: losses(q, fine))(p)
            updates, state = tx.update(grads, state, p)
            return optax.apply_updates(p, updates), state, loss

        def run(p, iters):
            tx = init_tx(p)
            state = tx.init(p)
            for _ in range(iters):
                p, state, loss = step(p, state)
            return p, float(loss)

        return run

    # init: translation from centroids, identity orientation
    centroid_t = np.asarray(target.mean(axis=1)) - np.asarray(
        server.verts_c.mean(axis=1)
    )
    params = {
        "global_orient": jnp.zeros((F, 3)),
        "pose": jnp.zeros((F, 45)),
        "transl": jnp.asarray(centroid_t, jnp.float32),
        "betas": jnp.zeros((10,)),
    }

    coarse = make_stage({"global_orient", "transl"}, fine=False)
    fine = make_stage({"global_orient", "transl", "pose", "betas"}, fine=True)
    params, _ = coarse(params, coarse_iters)
    params, final_loss = fine(params, fine_iters)

    v_fit = np.asarray(forward(params))
    vert_err = np.linalg.norm(
        v_fit - np.asarray(target), axis=-1
    ).mean(axis=1)

    poses = np.concatenate(
        [np.asarray(params["global_orient"]), np.asarray(params["pose"])], axis=1
    )
    return {
        "poses": poses.astype(np.float32),
        "betas": np.asarray(params["betas"], np.float32),
        "transl": np.asarray(params["transl"], np.float32),
        "vert_err": vert_err.astype(np.float32),
    }


def mark_outliers(vert_err: np.ndarray, k: float = 3.0) -> np.ndarray:
    """Median-MAD outlier flags (validate_metro/slerp role: bad frames get
    infilled by interpolation)."""
    med = np.median(vert_err)
    mad = np.median(np.abs(vert_err - med)) + 1e-9
    return np.abs(vert_err - med) > k * 1.4826 * mad


def slerp_infill(poses: np.ndarray, transl: np.ndarray,
                 bad: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Quaternion SLERP + translation lerp across invalid frames
    (generator/src/hand_pose/slerp.py:8-185 role), applied jointwise."""
    import jax.numpy as jnp2

    from ..utils.rot import (
        axis_angle_to_quaternion,
        quat_slerp,
        quaternion_to_axis_angle,
    )

    F = poses.shape[0]
    good = np.where(~bad)[0]
    if good.size == 0 or good.size == F:
        return poses, transl
    poses = poses.copy()
    transl = transl.copy()
    J = poses.shape[1] // 3
    quat = np.asarray(
        axis_angle_to_quaternion(jnp2.asarray(poses.reshape(F * J, 3)))
    ).reshape(F, J, 4)
    for i in np.where(bad)[0]:
        prev_c = good[good < i]
        nxt_c = good[good > i]
        if prev_c.size and nxt_c.size:
            a, b = prev_c[-1], nxt_c[0]
            t = (i - a) / (b - a)
            q = np.asarray(
                quat_slerp(jnp2.asarray(quat[a]), jnp2.asarray(quat[b]), t)
            )
            transl[i] = (1 - t) * transl[a] + t * transl[b]
        else:
            j = a = (prev_c[-1] if prev_c.size else nxt_c[0])
            q = quat[a]
            transl[i] = transl[a]
        poses[i] = np.asarray(
            quaternion_to_axis_angle(jnp2.asarray(q))
        ).reshape(-1)
    return poses, transl
