"""Hand-object alignment: 3-stage optimization (h -> o -> ho).

JAX port of the generator alignment stage (generator/scripts/
align_hands_object.py:20-110 + generator/src/alignment/pl_module/*):
- mode 'h':  hand 2D-keypoint reprojection with a GMoF robust kernel
- mode 'o':  object: centroid-contact to the hand + 2D point reprojection +
             in-front-of-camera hinge; the SfM scene scale unlocks after a
             warmup (generic_module.py staged requires_grad)
- mode 'ho': joint refinement + temporal smoothness on all trajectories

Each stage is an Adam loop over a single parameter pytree with per-stage
trainability masks; the "FakeDataset drives N iterations" pattern of the
reference becomes a plain fori loop of jitted steps.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..mano.lbs import lbs_forward, mano_full_pose
from ..mano.server import build_mano_server


def gmof(x: jnp.ndarray, sigma: float = 100.0) -> jnp.ndarray:
    """Geman-McClure robust kernel on squared residuals."""
    x2 = x**2
    return (sigma**2) * x2 / (sigma**2 + x2)


def project(K: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    z = jnp.maximum(pts[..., 2:3], 1e-6)
    return (
        pts[..., :2] / z * jnp.array([K[0, 0], K[1, 1]])
        + jnp.array([K[0, 2], K[1, 2]])
    )


class AlignmentProblem:
    def __init__(
        self,
        j2d_target: dict[str, np.ndarray],  # hand -> (F, 21, 2) 2D keypoints
        obj_pts2d: np.ndarray | None,  # (F, M, 2) tracked SfM keypoints
        obj_pts_cano: np.ndarray | None,  # (M, 3) canonical SfM points
        K: np.ndarray,  # (3, 3)
        hands=("right",),
        model_dir: str | None = None,
        weights: dict | None = None,
    ):
        self.hands = list(hands)
        self.servers = {
            h: build_mano_server(h == "right", np.zeros(10), model_dir)
            for h in self.hands
        }
        self.j2d_target = {
            h: jnp.asarray(v, jnp.float32) for h, v in j2d_target.items()
        }
        self.obj_pts2d = (
            jnp.asarray(obj_pts2d, jnp.float32) if obj_pts2d is not None else None
        )
        self.obj_pts_cano = (
            jnp.asarray(obj_pts_cano, jnp.float32)
            if obj_pts_cano is not None else None
        )
        self.K = jnp.asarray(K, jnp.float32)
        # loss weights following generator/confs/generic.yaml roles
        self.w = dict(
            j2d=1.0, o2d=1.0, contact=10.0, front=100.0, smooth=100.0,
        )
        if weights:
            self.w.update(weights)

    def init_params(self, n_frames: int, init: dict | None = None) -> dict:
        p: dict[str, Any] = {"obj_scale_log": jnp.zeros(())}
        for h in self.hands:
            p[h] = {
                "global_orient": jnp.zeros((n_frames, 3)),
                "pose": jnp.zeros((n_frames, 45)),
                "transl": jnp.tile(jnp.asarray([0.0, 0.0, 0.6]), (n_frames, 1)),
                "betas": jnp.zeros((10,)),
            }
        p["object"] = {
            "global_orient": jnp.zeros((n_frames, 3)),
            "transl": jnp.tile(jnp.asarray([0.0, 0.0, 0.6]), (n_frames, 1)),
        }
        if init:
            p = jax.tree_util.tree_map(
                lambda a, b: jnp.asarray(b) if b is not None else a, p, init
            )
        return p

    def hand_joints(self, p: dict, h: str) -> jnp.ndarray:
        srv = self.servers[h]
        F = p[h]["transl"].shape[0]
        full = mano_full_pose(
            srv.consts, p[h]["global_orient"], p[h]["pose"]
        )
        out = lbs_forward(
            srv.consts, jnp.broadcast_to(p[h]["betas"], (F, 10)), full
        )
        return out.joints + p[h]["transl"][:, None]

    def object_pts(self, p: dict) -> jnp.ndarray:
        from ..utils.rot import axis_angle_to_matrix

        R = axis_angle_to_matrix(p["object"]["global_orient"])
        s = jnp.exp(p["obj_scale_log"])
        return (
            jnp.einsum("fij,mj->fmi", R, self.obj_pts_cano * s)
            + p["object"]["transl"][:, None]
        )

    def loss(self, p: dict, mode: str, scale_unlocked: bool) -> jnp.ndarray:
        total = 0.0
        if mode in ("h", "ho"):
            for h in self.hands:
                j3d = self.hand_joints(p, h)
                j2d = project(self.K, j3d)
                total = total + self.w["j2d"] * jnp.mean(
                    gmof(j2d - self.j2d_target[h]).sum(-1)
                )
        if mode in ("o", "ho") and self.obj_pts_cano is not None:
            pts = self.object_pts(p)
            if self.obj_pts2d is not None:
                o2d = project(self.K, pts)
                total = total + self.w["o2d"] * jnp.mean(
                    gmof(o2d - self.obj_pts2d).sum(-1)
                )
            # centroid contact: object centroid near the hand root trajectory
            centroid = pts.mean(axis=1)
            for h in self.hands:
                j3d = jax.lax.stop_gradient(self.hand_joints(p, h))
                total = total + self.w["contact"] * jnp.mean(
                    jnp.sum((centroid - j3d[:, 0]) ** 2, -1)
                )
            # in-front-of-camera hinge
            total = total + self.w["front"] * jnp.mean(
                jnp.maximum(0.05 - pts[..., 2], 0.0)
            )
        if mode == "ho":
            # temporal smoothness on all trajectories
            for h in self.hands:
                t = p[h]["transl"]
                total = total + self.w["smooth"] * jnp.mean(
                    jnp.sum((t[1:] - t[:-1]) ** 2, -1)
                )
            t = p["object"]["transl"]
            total = total + self.w["smooth"] * jnp.mean(
                jnp.sum((t[1:] - t[:-1]) ** 2, -1)
            )
        return total

    def trainable(self, mode: str, scale_unlocked: bool):
        def walk(node, path):
            if isinstance(node, dict):
                return {k: walk(v, path + (k,)) for k, v in node.items()}
            root = path[0] if path else ""
            if root == "obj_scale_log":
                return "free" if (mode in ("o", "ho") and scale_unlocked) else "frozen"
            if root == "object":
                return "free" if mode in ("o", "ho") else "frozen"
            # hands
            return "free" if mode in ("h", "ho") else "frozen"

        return walk

    def fit(self, p: dict, mode: str, iters: int = 2000, lr: float = 1e-2,
            scale_unlock_at: int = 2000) -> dict:
        adam = optax.adam(1.0)
        state_locked = None
        history = []
        for phase, (start, end) in enumerate(
            [(0, min(scale_unlock_at, iters)), (min(scale_unlock_at, iters), iters)]
        ):
            if end <= start:
                continue
            unlocked = phase == 1
            labels = self.trainable(mode, unlocked)(p, ())
            tx = optax.multi_transform(
                {"free": optax.scale(1.0), "frozen": optax.set_to_zero()}, labels
            )
            adam_state = adam.init(p)
            mask_state = tx.init(p)

            @jax.jit
            def step(p, adam_state, mask_state, lr_):
                loss, grads = jax.value_and_grad(
                    lambda q: self.loss(q, mode, unlocked)
                )(p)
                updates, adam_state = adam.update(grads, adam_state, p)
                updates = jax.tree_util.tree_map(lambda u: lr_ * u, updates)
                updates, mask_state = tx.update(updates, mask_state, p)
                return optax.apply_updates(p, updates), adam_state, mask_state, loss

            cur_lr = lr
            for i in range(start, end):
                if i > 0 and i % 1000 == 0:
                    cur_lr *= 0.5  # staged lr decay (generic_module role)
                p, adam_state, mask_state, loss = step(
                    p, adam_state, mask_state, jnp.asarray(cur_lr)
                )
                history.append(float(loss))
        self.history = history
        return p
