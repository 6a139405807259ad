"""Pose refinement (stage 2): silhouette + contact fitting of pose tables.

Functional re-design of the reference fitting stack (code/src/fitting/
{model,loss,fitting}.py + code/optimize_ckpt.py):
- stage 1 optimises object scale + hand betas on a frame subsample,
- stage 2 refines per-frame translations / object orientation per batch,
- losses: cross-entity-masked silhouette L1 (x1000), fingertip-contact
  nearest-distance (x100), and for two-hand scenes 2D joint anchors +
  thresholded contact (loss.py:84-165),
- Adam(1e-2) with a reduce-on-plateau schedule and lr<1e-5 early stop
  (model.py:161-199).

The inner loop is one jitted update whose learning rate is a traced scalar,
so plateau reductions never recompile.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..mano.model_data import TIP_VERTEX_IDS
from ..mano.server import ManoServerState, mano_server_forward
from ..models.object_model import ObjectServerState, object_server_forward
from ..utils.mesh import seal_mano_faces
from .silhouette import render_silhouette


def load_contact_idx(model_dir: str = "./body_models") -> np.ndarray:
    """Fingertip contact-zone vertex ids: the reference ships them as
    contact_zones.pkl (fitting/loss.py:27-30); fall back to fingertip
    neighborhoods derived from the tip vertices when the asset is absent."""
    p = os.path.join(model_dir, "contact_zones.pkl")
    if os.path.exists(p):
        with open(p, "rb") as f:
            zones = pickle.load(f)["contact_zones"]
        return np.array([i for zone in zones.values() for i in zone])
    return TIP_VERTEX_IDS.copy()


def _min_dist2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3), (B, M, 3) -> (B, N) min squared distances."""
    d2 = (
        jnp.sum(a * a, -1)[:, :, None]
        + jnp.sum(b * b, -1)[:, None, :]
        - 2.0 * jnp.einsum("bnd,bmd->bnm", a, b)
    )
    return jnp.maximum(jnp.min(d2, axis=-1), 0.0)


class FittingProblem:
    """Static data for one optimization batch."""

    def __init__(
        self,
        servers: dict[str, Any],  # node_id -> server state
        faces: dict[str, np.ndarray],
        target_masks: dict[str, np.ndarray],  # node_id -> (B, H, W) binary
        w2c: np.ndarray,  # (B, 4, 4)
        K: np.ndarray,  # (3, 3) scaled to the mask resolution
        scene_scale: float,
        imsize: tuple[int, int],
        contact_idx: np.ndarray,
        face_chunk: int = 64,
        sigma: float = 1e-6,
        contact_thres: float = 0.0,
    ):
        self.servers = servers
        self.node_ids = list(servers.keys())
        self.hand_ids = [n for n in self.node_ids if n in ("right", "left")]
        self.faces = {
            nid: (
                seal_mano_faces(f, nid == "right") if nid in ("right", "left")
                else np.asarray(f)
            )
            for nid, f in faces.items()
        }
        self.targets = {
            k: jnp.asarray(v, jnp.float32) for k, v in target_masks.items()
        }
        self.w2c = jnp.asarray(w2c, jnp.float32)
        self.K = jnp.asarray(K, jnp.float32)
        self.scene_scale = float(scene_scale)
        self.imsize = imsize
        self.contact_idx = jnp.asarray(contact_idx)
        self.face_chunk = face_chunk
        self.sigma = sigma
        self.contact_thres = float(contact_thres)

    # -- forward ------------------------------------------------------------

    def forward(self, params: dict) -> dict:
        from ..utils.mesh import seal_mano_verts

        B = self.w2c.shape[0]
        out: dict[str, Any] = {}
        for nid in self.node_ids:
            p = params[nid]
            if nid in ("right", "left"):
                thetas = jnp.concatenate(
                    [p["global_orient"], p["pose"]], axis=-1
                )
                betas = jnp.broadcast_to(p["betas"], (B, 10))
                srv_out = mano_server_forward(
                    self.servers[nid], jnp.full((B,), self.scene_scale),
                    p["transl"], thetas, betas,
                )
                verts = srv_out.verts
                out[f"{nid}.jnts"] = srv_out.jnts
            else:
                srv_out = object_server_forward(
                    self.servers[nid], jnp.full((B,), self.scene_scale),
                    p["transl"], p["global_orient"],
                    obj_scale=params["obj_scale"],
                )
                verts = srv_out.verts
            # world -> camera
            v_cam = (
                jnp.einsum("bij,bnj->bni", self.w2c[:, :3, :3], verts)
                + self.w2c[:, None, :3, 3]
            )
            out[f"{nid}.v3d_c"] = v_cam
            v_render = (
                seal_mano_verts(v_cam) if nid in ("right", "left") else v_cam
            )
            out[f"{nid}.mask"] = render_silhouette(
                v_render, jnp.asarray(self.faces[nid]), self.K, self.imsize,
                sigma=self.sigma, face_chunk=self.face_chunk,
            )
        return out

    # -- losses (loss.py parity) -------------------------------------------

    def hard_iou(self, out: dict) -> float:
        """Binarized silhouette IoU vs the targets, averaged over entities
        and frames.

        Acceptance metric for the do-no-harm guard (NOT the fit loss): the
        soft-raster L1 carries a systematic boundary-band bias (the sigma
        blur fattens every predicted silhouette), so an optimizer can
        "improve" it on an already-correct init by shrinking the model along
        the camera ray — measured on bench_seq: fit loss 25.9 -> 2.9 while
        eval f10_right degraded 44.4 -> 31.8 (logs/step_2b.log, r5 pipeline).
        Thresholding at 0.5 removes the band, so IoU only moves when the
        hard silhouette alignment actually changes."""
        ious = []
        for nid in self.node_ids:
            pred = (out[f"{nid}.mask"] > 0.5).astype(jnp.float32)
            tgt = self.targets[nid]
            inter = jnp.sum(pred * tgt, axis=(1, 2))
            union = jnp.sum(jnp.maximum(pred, tgt), axis=(1, 2))
            ious.append(inter / jnp.maximum(union, 1.0))
        return float(jnp.mean(jnp.stack(ious)))

    def loss_single_hand(self, out: dict, flag: str) -> dict:
        tips = out[f"{flag}.v3d_c"][:, self.contact_idx]
        d2 = _min_dist2(tips, out["object.v3d_c"])
        if self.contact_thres > 0.0:
            # deadzone (deviation, opt-in via --contact_thres; default 0 is
            # reference parity, loss.py:92 penalises any tip-object gap):
            # the unthresholded pull is scale<->depth degenerate with the
            # silhouette term and drags already-touching inits (see
            # docs/pipeline.md), so stop pulling once tips are within the
            # threshold — mirroring the deadzone the reference itself uses
            # in its two-hand variant (loss.py:135-140).
            d2 = jnp.where(d2 < self.contact_thres**2, 0.0, d2)
        loss_contact = jnp.mean(d2)

        valid_o = 1.0 - self.targets[flag]
        err_o = jnp.abs(out["object.mask"] - self.targets["object"]) * valid_o
        loss_mask_o = jnp.sum(err_o) / jnp.maximum(jnp.sum(valid_o), 1.0)

        valid_h = 1.0 - self.targets["object"]
        err_h = jnp.abs(out[f"{flag}.mask"] - self.targets[flag]) * valid_h
        loss_mask_h = jnp.sum(err_h) / jnp.maximum(jnp.sum(valid_h), 1.0)

        d = {
            "mask_o": loss_mask_o * 1000.0,
            "mask_h": loss_mask_h * 1000.0,
            "fine_ho": loss_contact * 100.0,
        }
        d["loss"] = sum(d.values())
        return d

    def loss_two_hands(self, out: dict, j2d_targets: dict) -> dict:
        valid = (1.0 - self.targets["right"]) * (1.0 - self.targets["left"])
        err_o = jnp.abs(out["object.mask"] - self.targets["object"]) * valid
        loss_mask_o = jnp.sum(err_o) / jnp.maximum(jnp.sum(valid), 1.0)

        v_o = out["object.v3d_c"]
        thres = 2.0**2
        d = {}
        for flag in ("right", "left"):
            tips = out[f"{flag}.v3d_c"][:, self.contact_idx]
            c = jnp.mean(_min_dist2(tips, v_o), axis=1)
            c = jnp.where(c < thres, 0.0, c)
            d[f"contact_{flag[0]}o"] = jnp.mean(c) * 0.05
            # 2D vertex anchors against the initial projection
            z = jnp.maximum(out[f"{flag}.v3d_c"][..., 2:3], 1e-6)
            j2d = (
                out[f"{flag}.v3d_c"][..., :2] / z
                * jnp.array([self.K[0, 0], self.K[1, 1]])
                + jnp.array([self.K[0, 2], self.K[1, 2]])
            )
            d[f"v2d_{flag[0]}"] = jnp.mean((j2d - j2d_targets[flag]) ** 2)
        d["mask_o"] = loss_mask_o * 1000.0
        d["loss"] = sum(d.values())
        return d


def build_fit_params(
    tables: dict[str, dict], node_ids, obj_scale: float, frame_idx: np.ndarray
) -> dict:
    """Slice per-frame pose tables into an optimization pytree."""
    p: dict[str, Any] = {}
    for nid in node_ids:
        t = tables[nid]
        if nid in ("right", "left"):
            p[nid] = {
                "betas": jnp.asarray(t["betas"]),
                "global_orient": jnp.asarray(t["global_orient"][frame_idx]),
                "pose": jnp.asarray(t["pose"][frame_idx]),
                "transl": jnp.asarray(t["transl"][frame_idx]),
            }
        else:
            p[nid] = {
                "global_orient": jnp.asarray(t["global_orient"][frame_idx]),
                "transl": jnp.asarray(t["transl"][frame_idx]),
            }
    p["obj_scale"] = jnp.asarray(float(obj_scale), jnp.float32)
    return p


def fit_labels(params: dict, freeze_scale: bool, freeze_shape: bool) -> Any:
    """Trainability schedule (fitting.py:58-68): hand pose + hand global
    orient always frozen; betas/obj_scale per stage; translations + object
    orientation free."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        name = path[-1]
        if name == "obj_scale":
            return "frozen" if freeze_scale else "free"
        if name == "betas":
            return "frozen" if freeze_shape else "free"
        if name == "pose":
            return "frozen"
        if name == "global_orient" and path[0] in ("right", "left"):
            return "frozen"
        return "free"

    return walk(params, ())


def run_fit(
    problem: FittingProblem,
    params: dict,
    freeze_scale: bool,
    freeze_shape: bool,
    num_iterations: int = 500,
    lr0: float = 1e-2,
    tol_lr: float = 1e-5,
    plateau_patience: int = 30,
    verbose: bool = False,
    callback=None,  # fn(iter, params, loss) — e.g. diagnostics.FitRecorder
):
    two_hands = len(problem.hand_ids) == 2
    j2d_targets = {}
    if two_hands:
        out0 = problem.forward(params)
        for flag in ("right", "left"):
            z = jnp.maximum(out0[f"{flag}.v3d_c"][..., 2:3], 1e-6)
            j2d = (
                out0[f"{flag}.v3d_c"][..., :2] / z
                * jnp.array([problem.K[0, 0], problem.K[1, 1]])
                + jnp.array([problem.K[0, 2], problem.K[1, 2]])
            )
            j2d_targets[flag] = jax.lax.stop_gradient(j2d)

    labels = fit_labels(params, freeze_scale, freeze_shape)
    tx = optax.multi_transform(
        {"free": optax.scale(1.0), "frozen": optax.set_to_zero()}, labels
    )
    adam = optax.adam(1.0, eps=1e-8)  # lr applied manually (traced)
    opt_state = (adam.init(params), tx.init(params))

    def loss_fn(p):
        out = problem.forward(p)
        if two_hands:
            d = problem.loss_two_hands(out, j2d_targets)
        else:
            d = problem.loss_single_hand(out, problem.hand_ids[0])
        return d["loss"], d

    @jax.jit
    def step(p, opt_state, lr):
        (loss, d), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        adam_state, mask_state = opt_state
        # adam with unit lr yields the negated step direction; scale by the
        # traced lr so plateau reductions don't recompile
        updates, adam_state = adam.update(grads, adam_state, p)
        updates = jax.tree_util.tree_map(lambda u: lr * u, updates)
        updates, mask_state = tx.update(updates, mask_state, p)
        p = optax.apply_updates(p, updates)
        return p, (adam_state, mask_state), loss, d

    params0 = params
    lr = lr0
    best = np.inf
    plateau = 0
    history = []
    for i in range(num_iterations):
        params, opt_state, loss, d = step(params, opt_state, jnp.asarray(lr))
        loss_v = float(loss)
        history.append(loss_v)
        if callback is not None:
            callback(i, params, loss_v)
        if not np.isfinite(loss_v):
            break
        if loss_v < best - 1e-6:
            best = loss_v
            plateau = 0
        else:
            plateau += 1
            if plateau > plateau_patience:
                lr *= 0.1
                plateau = 0
        if lr < tol_lr:
            break
        if verbose and i % 50 == 0:
            print(f"  fit iter {i}: loss {loss_v:.4f} lr {lr:.2e}")
    # do-no-harm guard (VERDICT r4 #2), round-5b criterion: accept the
    # refinement only when the BINARIZED silhouette IoU improves, not when
    # the soft fit loss does.  The soft L1 has a sigma-band bias that an
    # optimizer exploits on near-perfect inits (depth-drag: fit loss
    # 25.9 -> 2.9 with eval f10_right 44.4 -> 31.8 on bench_seq); hard IoU
    # only moves when 2D alignment actually changes, so a good init is kept
    # verbatim and a corrupted init (the refinement demo) is still fixed.
    # The loss must also not have diverged.  The reference has no such
    # guard (model.py:161-199 only early-stops on lr); deliberate addition.
    finite = [h for h in history if np.isfinite(h)]
    loss_ok = bool(finite and min(finite[1:] or [np.inf]) < finite[0] - 1e-6)
    iou0 = problem.hard_iou(problem.forward(params0))
    iou1 = problem.hard_iou(problem.forward(params))
    improved = bool(loss_ok and iou1 > iou0 + 1e-4)
    if not improved:
        params = params0
    guard = {"iou_init": iou0, "iou_final": iou1, "loss_improved": loss_ok}
    return params, history, improved, guard
