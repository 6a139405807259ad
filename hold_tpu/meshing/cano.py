"""Canonical meshing of the per-node SDF fields (between training epochs).

Host-driven: the MISE octree (C++) proposes grid points, the SDF MLP evaluates
them on the accelerator in fixed-size batches (one compiled executable reused
across rounds).  Mirrors meshing_cano at code/src/model/renderables/
{mano_node.py:137-151, object_node.py:112-121}.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mlp import apply_implicit_net
from ..utils.mesh import Mesh
from .mise import generate_mesh

POINT_BATCH = 10000


def make_node_sdf_fn(nparams: dict, plans, cond_dim: int):
    """Returns numpy->numpy sdf fn with a fixed-shape jitted core."""

    @jax.jit
    def core(implicit_params, pts):
        cond = jnp.zeros((pts.shape[0], cond_dim))
        out = apply_implicit_net(
            implicit_params, plans.implicit, pts, cond, step=None,
            barf_cfg=plans.barf_cfg,
        )
        return out[:, 0]

    implicit_params = nparams["implicit"]

    def sdf_fn(pts_np: np.ndarray) -> np.ndarray:
        n = pts_np.shape[0]
        pad = (-n) % POINT_BATCH
        pts = np.concatenate(
            [pts_np, np.zeros((pad, 3), np.float32)]
        ) if pad else pts_np
        vals = []
        for s in range(0, pts.shape[0], POINT_BATCH):
            vals.append(np.asarray(core(implicit_params, jnp.asarray(pts[s:s + POINT_BATCH]))))
        return np.concatenate(vals)[:n]

    return sdf_fn


def mesh_hand_cano(nparams: dict, scene, nid: str, res_init: int = 64,
                   res_up: int = 1) -> Mesh | None:
    """Canonical hand mesh in the fixed canonical-hand bbox.

    The reference hard-codes the empirical MANO canonical bbox
    (mano_node.py:143); we derive it from the server's canonical verts so the
    synthetic test model works too."""
    plans = scene.plans[nid]
    server = scene.servers[nid]
    bbox_pts = np.asarray(server.verts_c[0])
    sdf_fn = make_node_sdf_fn(nparams, plans, cond_dim=45)
    return generate_mesh(
        sdf_fn, bbox_pts, res_init=res_init, res_up=res_up,
        point_batch=POINT_BATCH,
    )


def mesh_object_cano(nparams: dict, scene, res_init: int = 32,
                     res_up: int = 2) -> Mesh | None:
    """Canonical object mesh over 2x the SfM point-cloud bbox
    (object_node.py:49-50,112-121)."""
    plans = scene.plans["object"]
    server = scene.servers["object"]
    v = np.asarray(server.v3d_cano)
    bbox = np.stack([v.min(0), v.max(0)]) * 2.0
    sdf_fn = make_node_sdf_fn(nparams, plans, cond_dim=0)
    return generate_mesh(
        sdf_fn, bbox, res_init=res_init, res_up=res_up,
        point_batch=POINT_BATCH,
    )


def mesh_all_cano(params: dict, scene, res_scale: int = 1) -> dict[str, Mesh]:
    """res_scale divides the grid resolutions (CPU smoke runs use >1)."""
    out = {}
    for nid in scene.node_ids:
        try:
            if nid in ("right", "left"):
                m = mesh_hand_cano(params[nid], scene, nid,
                                   res_init=max(64 // res_scale, 8))
            else:
                m = mesh_object_cano(params[nid], scene,
                                     res_init=max(32 // res_scale, 8))
            if m is not None and m.faces.shape[0] > 0:
                out[nid] = m
        except Exception as e:  # meshing must never kill training (hold.py:154-166)
            print(f"[meshing] failed for {nid}: {e}")
    return out
