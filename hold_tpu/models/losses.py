"""Training losses + schedules (parity with code/src/hold/loss.py + loss_terms.py).

All schedules are traced functions of the global step, so the whole loss lives
inside one compiled train step.  Index-select patterns from the reference
(boolean masks with data-dependent size) become masked means — identical
values, static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from .specs import SEGM_IDS

MILESTONE = 30000


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over mask==1 entries (mask broadcast against values)."""
    mask = jnp.broadcast_to(mask, values.shape).astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1e-6)


def rgb_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """L1 with NaN-ray filtering (loss.py:33-39)."""
    finite = jnp.all(jnp.isfinite(pred), axis=-1, keepdims=True)
    pred = jnp.where(finite, pred, 0.0)
    gt = jnp.where(finite, gt, 0.0)
    l1 = jnp.abs(pred - gt)
    # reference normalises by the count of valid *pixels* (all were valid)
    return jnp.sum(l1 * finite) / jnp.maximum(pred.shape[0], 1)


def semantic_gt_onehot(mask_vals: jnp.ndarray) -> jnp.ndarray:
    """Greyscale mask values -> 4-class one-hot with the reference's
    aliasing-tolerant banding (loss_terms.py:68-88): <25 bg, <100 object,
    <200 right, else left."""
    cls = jnp.where(
        mask_vals < 25, 0,
        jnp.where(mask_vals < 100, 1, jnp.where(mask_vals < 200, 2, 3)),
    )
    return jnp.eye(len(SEGM_IDS))[cls]


def sem_loss(sem_pred: jnp.ndarray, mask_gt: jnp.ndarray) -> jnp.ndarray:
    onehot = semantic_gt_onehot(mask_gt)
    l2 = (sem_pred - onehot) ** 2
    return jnp.sum(l2) / jnp.maximum(sem_pred.shape[0], 1)


def eikonal_loss(grad_theta: jnp.ndarray) -> jnp.ndarray:
    from ..utils.transforms import safe_norm

    return jnp.mean((safe_norm(grad_theta) - 1.0) ** 2)


def opacity_sparse_loss(mask_prob: jnp.ndarray, off_surface: jnp.ndarray) -> jnp.ndarray:
    """L1 of fg opacity on rays classified off-surface (loss_terms.py:43-54)."""
    return masked_mean(jnp.abs(mask_prob[:, 0]), off_surface.astype(jnp.float32))


def mano_cano_loss(pred_sdf: jnp.ndarray, gt_sdf: jnp.ndarray,
                   limit: float = 0.01) -> jnp.ndarray:
    pred = jnp.clip(pred_sdf, -limit, limit)
    gt = jnp.clip(gt_sdf, -limit, limit)
    return jnp.mean(jnp.abs(pred - gt))


def compute_losses(batch: dict, outputs: dict, node_ids, step) -> dict:
    """Full training loss (loss.py:17-93).

    batch: gt_rgb (R, 3), gt_mask (R,); outputs from holdnet_forward."""
    prog = jnp.minimum(step, MILESTONE).astype(jnp.float32) / MILESTONE
    w_sem = 1.1 + (0.1 - 1.1) * prog
    w_sparse = prog

    losses = {}
    losses["loss/rgb"] = rgb_loss(outputs["rgb"], batch["gt_rgb"])
    losses["loss/sem"] = sem_loss(outputs["semantics"], batch["gt_mask"]) * w_sem

    sparse = 0.0
    eik = 0.0
    cano = 0.0
    for nid in node_ids:
        if f"{nid}.index_off_surface" in outputs:
            active = outputs[f"{nid}.active"]
            sparse = sparse + active * opacity_sparse_loss(
                outputs[f"{nid}.mask_prob"], outputs[f"{nid}.index_off_surface"]
            )
            eik = eik + active * eikonal_loss(outputs[f"{nid}.grad_theta"])
        if f"{nid}.pts2mano_sdf_cano" in outputs:
            active = outputs[f"{nid}.active"]
            cano = cano + active * mano_cano_loss(
                outputs[f"{nid}.pred_sdf"],
                jnp.asarray(outputs[f"{nid}.pts2mano_sdf_cano"]),
            )

    # proposal-net distillation (sampler FLOP diet, no reference
    # counterpart): L1 regression of the small sampler surrogate onto the
    # trunk's sdf at this step's ray samples.  Both inputs and targets are
    # stop-gradient upstream, so this term trains ONLY the proposal params
    # and cannot perturb the reference-parity losses above.
    prop = 0.0
    for nid in node_ids:
        if f"{nid}.proposal_pred" in outputs:
            prop = prop + jnp.mean(
                jnp.abs(
                    outputs[f"{nid}.proposal_pred"]
                    - outputs[f"{nid}.proposal_tgt"]
                )
            )
    losses["loss/proposal"] = prop

    # thresholded eikonal (loss.py:83-88): only contributes above the floor
    eik = eik * 1e-5
    losses["loss/eikonal"] = jnp.where(eik > 8e-4, eik, 0.0)
    losses["loss/mano_cano"] = cano * 5.0
    losses["loss/opacity_sparse"] = sparse * w_sparse
    losses["loss"] = (
        losses["loss/rgb"]
        + losses["loss/sem"]
        + losses["loss/eikonal"]
        + losses["loss/mano_cano"]
        + losses["loss/opacity_sparse"]
        + losses["loss/proposal"]
    )
    return losses

