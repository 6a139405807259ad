"""Scene nodes: MANO hands and the rigid object as functional forwards.

Each node owns a canonical SDF field (ImplicitNet), a color field
(RenderingNet), a Laplace density, per-frame pose tables, and a deformer that
warps deformed-space ray samples into the canonical field.  This file is the
TPU-native counterpart of code/src/model/renderables/{node,mano_node,
object_node}.py — same math, but expressed as pure functions over parameter
pytrees with every hot path (KNN skinning, inverse LBS, SDF queries,
error-bound sampling) batched over a flat ray axis.

Shapes: a batch carries B frames x P pixels; ray-level tensors are flattened
to R = B*P; deformer-level tensors keep the (B, P*S) frame grouping because
bone transforms differ per frame.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple

import jax
from jax.ad_checkpoint import checkpoint_name
import jax.numpy as jnp
import numpy as np

from ..mano.server import ManoServerState, mano_server_forward
from ..ops.knn import (
    knn_blend_weights,
    knn_inverse_warp,
    knn_inverse_warp_diff,
    knn_jacobian_inverse,
    skinning,
    skinning_jacobian,
)
from ..render.ray_sampler import (
    SamplerConfig,
    error_bound_z_vals,
    node_ray_interval,
)
from ..utils.transforms import inverse_mat3, safe_norm
from ..ops.chunk import map_chunked
from .density import laplace_beta, laplace_density
from .mlp import (
    apply_implicit_net,
    apply_implicit_trunk,
    apply_rendering_net,
    implicit_feat_from_trunk,
    implicit_sdf_from_trunk,
    resolve_weight_norm,
)
from .object_model import ObjectServerState, object_deform, object_server_forward
from .specs import CLASS_IDS, MAX_CLASS


class NodePlans(NamedTuple):
    """Static (non-pytree) per-node config captured in the jit closure."""

    implicit: dict
    rendering: dict
    sampler: SamplerConfig
    barf_cfg: tuple
    node_id: str
    class_id: int
    knn_k: int = 15
    max_dist: float = 0.1
    proposal: dict | None = None  # proposal-net plan (sampler FLOP diet)


# --------------------------------------------------------------------------
# Pose-parameter tables (per-frame embeddings; code/src/model/generic/params.py)
# --------------------------------------------------------------------------

def gather_mano_pose(tables: dict, frame_idx: jnp.ndarray) -> dict:
    """tables: betas (1,10), global_orient (N,3), pose (N,45), transl (N,3)."""
    return {
        "betas": jnp.broadcast_to(tables["betas"], (frame_idx.shape[0], 10)),
        "global_orient": tables["global_orient"][frame_idx],
        "pose": tables["pose"][frame_idx],
        "transl": tables["transl"][frame_idx],
    }


def gather_object_pose(tables: dict, frame_idx: jnp.ndarray) -> dict:
    return {
        "global_orient": tables["global_orient"][frame_idx],
        "transl": tables["transl"][frame_idx],
    }


# --------------------------------------------------------------------------
# MANO node
# --------------------------------------------------------------------------

def _flat_per_point(x_per_frame: jnp.ndarray, num_points: int) -> jnp.ndarray:
    """(B, C) -> (B*num_points, C) by repeat — per-frame conditioning vectors
    broadcast to every sample point of that frame."""
    B, C = x_per_frame.shape
    return jnp.broadcast_to(
        x_per_frame[:, None, :], (B, num_points, C)
    ).reshape(B * num_points, C)


def mano_node_forward(
    nparams: dict,
    server: ManoServerState,
    plans: NodePlans,
    batch: dict,  # frame_idx (B,), uv (B,P,2), intrinsics (B,4,4), extrinsics (B,4,4)
    ray_dirs: jnp.ndarray,  # (R, 3) flattened
    cam_loc: jnp.ndarray,  # (R, 3)
    step,  # traced global step (or None at eval)
    epoch,  # traced epoch (or None)
    rng,
    training: bool,
    z_vals: jnp.ndarray | None = None,  # precomputed by the sampler stage
):
    """Returns (factors, sample_dict).

    When ``z_vals`` is given the error-bound sampler is skipped — the train
    step runs sampling as a separate jitted stage (its output is
    stop-gradient), which keeps each compiled graph small enough for the TPU
    compiler."""
    B, P = batch["uv"].shape[:2]
    # weight-norm resolved once, outside the chunk loop (see resolve_weight_norm)
    nparams = dict(nparams)
    nparams["implicit"] = resolve_weight_norm(nparams["implicit"])
    nparams["rendering"] = resolve_weight_norm(nparams["rendering"])
    frame_idx = batch["frame_idx"]
    pose = gather_mano_pose(nparams["tables"], frame_idx)
    full_pose = jnp.concatenate([pose["global_orient"], pose["pose"]], axis=-1)

    scene_scale = batch["scene_scale"]  # scalar (constant per sequence)
    srv_out = mano_server_forward(
        server, jnp.broadcast_to(scene_scale, (B,)), pose["transl"], full_pose,
        pose["betas"],
    )

    # pose conditioning: /pi normalisation; zeroed for epochs < 20
    # (mano_node.py:82-85)
    cond_pose = full_pose[:, 3:] / np.pi
    if training and epoch is not None:
        cond_pose = jnp.where(epoch < 20, 0.0, 1.0) * cond_pose

    tfs = srv_out.tfs  # (B, 16, 4, 4)
    verts_posed = srv_out.verts  # (B, V, 3)
    verts_c = jnp.broadcast_to(server.verts_c, (B,) + server.verts_c.shape[1:])
    skin_w = jnp.broadcast_to(
        server.skin_weights_c, (B,) + server.skin_weights_c.shape[1:]
    )

    def inverse_warp(pts_bps):  # (B, P*S, 3) deformed -> canonical
        # sampler-only path (stop-gradient): fused single-kernel warp
        return knn_inverse_warp(
            pts_bps, verts_posed, skin_w, tfs,
            K=plans.knn_k, max_dist=plans.max_dist,
        )

    def sdf_at(pts_flat_c, n_pts):  # canonical points (N, 3) -> (N, 1+F)
        # 45-d conditioning is CVPR-zeroed; the trunk drops its columns
        return apply_implicit_net(
            nparams["implicit"], plans.implicit, pts_flat_c, None,
            step=step, barf_cfg=plans.barf_cfg,
        )

    def sampler_sdf(pts_RS3):  # (R, S, 3) -> (R, S) for the error-bound loop
        S = pts_RS3.shape[1]
        pts = pts_RS3.reshape(B, P * S, 3)
        x_c, _ = inverse_warp(pts)
        out = sdf_at(x_c.reshape(-1, 3), B * P * S)
        return out[:, 0].reshape(B * P, S)

    if z_vals is None:
        beta0 = jax.lax.stop_gradient(laplace_beta(nparams["density"]))
        z_vals = error_bound_z_vals(
            rng, sampler_sdf, ray_dirs, cam_loc, beta0, plans.sampler, training
        )  # (R, S_f)
    S_f = z_vals.shape[1]

    points = cam_loc[:, None, :] + z_vals[:, :, None] * ray_dirs[:, None, :]
    pts = points.reshape(B, P * S_f, 3)
    N_pts = B * P * S_f

    if not training and _use_fused_render(plans):
        # inference: the whole per-point pipeline is stop-gradient, so warp
        # + Jinv + trunk fwd/bwd + feature + color run as ONE Pallas kernel
        # (ops/fused_render.py)
        from ..ops.fused_query import pack_trunk_weights
        from ..ops.fused_render import (
            frame_bias0, fused_hand_render, pack_color_weights,
            pack_trunk_transposed,
        )
        from .mlp import _apply_linear as _lin_f32

        pe = _lin_f32(nparams["rendering"]["lin_pose"], cond_pose)  # (B, 8)
        sdf_f, rgb_f, nrm_f, dist, x_c = fused_hand_render(
            pts, verts_posed, verts_c, skin_w, tfs,
            _fused_embed_plan(plans, step),
            pack_trunk_weights(nparams["implicit"], plans.implicit),
            pack_trunk_transposed(nparams["implicit"], plans.implicit),
            pack_color_weights(nparams["rendering"], nparams["implicit"]),
            frame_bias0(nparams["rendering"], pe),
            K=plans.knn_k, interpret=_fused_render_interpret(),
        )
        outlier = dist > plans.max_dist
        density = laplace_density(
            nparams["density"], sdf_f.reshape(-1)
        ).reshape(B * P, S_f, 1)
        semantics = jnp.zeros((B * P, S_f, MAX_CLASS)).at[
            :, :, plans.class_id
        ].set(1.0)
        factors = {
            "color": rgb_f.reshape(B * P, S_f, 3),
            "normal": nrm_f.reshape(B * P, S_f, 3),
            "density": density,
            "semantics": semantics,
            "z_vals": z_vals,
        }
        sample_dict = {
            "canonical_pts": x_c.reshape(B, P, S_f, 3),
            "cond_pose": cond_pose,
            "tfs": tfs,
            "verts_posed": verts_posed,
            "v_posed": srv_out.v_posed,
            "jnts": srv_out.jnts,
            "outlier": outlier,
        }
        return factors, sample_dict

    # deformed -> canonical warp, fused into one differentiable Pallas kernel
    # (KNN against the per-frame POSED verts + weight blend + affine inverse
    # + apply, with a closed-form Pallas VJP for pts/tfs — the per-point 3x3
    # algebra never reaches XLA, where every layout orientation degenerated
    # to 128-lane padded singleton slices)
    x_c, outlier = knn_inverse_warp_diff(
        pts, verts_posed, skin_w, tfs,
        K=plans.knn_k, max_dist=plans.max_dist,
    )
    x_c_flat = x_c.reshape(-1, 3)

    # inverse forward-skinning Jacobian at canonical points: weights queried
    # against the CANONICAL verts (deformer.py:70-82), same fused treatment
    Jinv9_bn = knn_jacobian_inverse(
        x_c, verts_c, skin_w, tfs, K=plans.knn_k,
    ).reshape(B, P * S_f, 9)

    if _use_fused_shade(plans):
        # whole per-point shade (PE + trunk + heads + in-kernel normals +
        # color) as ONE custom-VJP Pallas op: forward saves only its inputs,
        # backward recomputes in VMEM (ops/fused_shade.py)
        from ..ops.fused_query import pack_trunk_weights
        from ..ops.fused_render import (
            frame_bias0, pack_color_weights, pack_trunk_transposed,
        )
        from ..ops.fused_shade import fused_shade_train
        from .mlp import _apply_linear as _lin_fs

        pe = _lin_fs(nparams["rendering"]["lin_pose"], cond_pose).astype(
            jnp.float32
        )
        sdf_bn, rgb_bn, nrm_bn = fused_shade_train(
            x_c, Jinv9_bn, frame_bias0(nparams["rendering"], pe),
            _fused_embed_plan(plans, step),
            pack_trunk_weights(nparams["implicit"], plans.implicit),
            pack_trunk_transposed(nparams["implicit"], plans.implicit),
            pack_color_weights(nparams["rendering"], nparams["implicit"]),
            interpret=_fused_train_interpret(),
        )
        return _node_outputs(
            plans, z_vals, sdf_bn.reshape(-1), rgb_bn.reshape(-1, 3),
            nrm_bn.reshape(-1, 3), nparams, B, P, S_f,
        ), {
            "canonical_pts": x_c_flat.reshape(B, P, S_f, 3),
            "sample_sdf": sdf_bn.reshape(B, P, S_f),
            "cond_pose": cond_pose,
            "tfs": tfs,
            "verts_posed": verts_posed,
            "v_posed": srv_out.v_posed,
            "jnts": srv_out.jnts,
            "outlier": outlier,
        }

    Jinv9 = Jinv9_bn.reshape(-1, 9)
    view = -jnp.broadcast_to(
        ray_dirs[:, None, :], (B * P, S_f, 3)
    ).reshape(-1, 3)

    # chunked per-point shading: fused SDF forward+vjp through the scalar
    # head (replaces the reference's double implicit forward + autograd pass
    # at volsdf_utils.py:82-105) + color MLP; only the MLPs live inside the
    # remat'd chunk, so the backward recompute is just the trunks
    imp_sh = _shade_params(nparams["implicit"])
    rend_sh = _shade_params(nparams["rendering"])

    # lin_pose applied once per FRAME (B, 8), then broadcast — the old
    # per-point (N, 45) conditioning broadcast cost 184 MB at 10k rays, and
    # the trunk zeroes its copy anyway (CVPR behaviour, handled by layer-0
    # column dropping in apply_implicit_trunk)
    from .mlp import _apply_linear as _lin

    pe_pp = _flat_per_point(
        _lin(rend_sh["lin_pose"], cond_pose).astype(jnp.float32), P * S_f
    )

    def shade(xc, pe, vw, jinv9):
        def field(p):
            h = apply_implicit_trunk(
                imp_sh, plans.implicit, p, None,
                step=step, barf_cfg=plans.barf_cfg,
            )
            # f32 head over the (possibly bf16) trunk activation
            return implicit_sdf_from_trunk(nparams["implicit"], h), h

        (sdf, h_trunk), vjp = jax.vjp(field, xc)
        h_trunk = checkpoint_name(h_trunk, "saved")
        g = vjp((jnp.ones_like(sdf), jnp.zeros_like(h_trunk)))[0]
        g = g.astype(jnp.float32)
        feat = implicit_feat_from_trunk(imp_sh, h_trunk)

        # n_j = sum_i g_i (J^-1)_{ij}  (volsdf_utils.py:98-102); jinv9 is
        # row-major (N, 9) — expanded explicitly to avoid a (N, 3, 3) relayout
        nrm = jnp.stack(
            [
                sum(g[:, i] * jinv9[:, 3 * i + j] for i in range(3))
                for j in range(3)
            ],
            axis=-1,
        )
        nrm = nrm / jnp.maximum(safe_norm(nrm, keepdims=True), 1e-6)
        rgb = apply_rendering_net(
            rend_sh, plans.rendering,
            xc, nrm, vw, None, feat, step=step, barf_cfg=plans.barf_cfg,
            pose_embed=pe,
        )
        return sdf, rgb, nrm

    sdf_flat, rgb, normals = map_chunked(
        shade, (x_c_flat, pe_pp, view, Jinv9), N_pts, remat=_shade_remat(),
    )

    density = laplace_density(nparams["density"], sdf_flat).reshape(B * P, S_f, 1)
    semantics = jnp.zeros((B * P, S_f, MAX_CLASS)).at[:, :, plans.class_id].set(1.0)

    factors = {
        "color": rgb.reshape(B * P, S_f, 3),
        "normal": normals.reshape(B * P, S_f, 3),
        "density": density,
        "semantics": semantics,
        "z_vals": z_vals,
    }
    sample_dict = {
        "canonical_pts": x_c_flat.reshape(B, P, S_f, 3),
        "sample_sdf": sdf_flat.reshape(B, P, S_f),
        "cond_pose": cond_pose,
        "tfs": tfs,
        "verts_posed": verts_posed,
        "v_posed": srv_out.v_posed,
        "jnts": srv_out.jnts,
        "outlier": outlier,
    }
    return factors, sample_dict


# --------------------------------------------------------------------------
# Object node
# --------------------------------------------------------------------------

def object_node_forward(
    nparams: dict,
    server: ObjectServerState,
    plans: NodePlans,
    batch: dict,
    ray_dirs: jnp.ndarray,
    cam_loc: jnp.ndarray,
    step,
    epoch,
    rng,
    training: bool,
    z_vals: jnp.ndarray | None = None,
):
    B, P = batch["uv"].shape[:2]
    nparams = dict(nparams)
    nparams["implicit"] = resolve_weight_norm(nparams["implicit"])
    nparams["rendering"] = resolve_weight_norm(nparams["rendering"])
    frame_idx = batch["frame_idx"]
    pose = gather_object_pose(nparams["tables"], frame_idx)
    scene_scale = batch["scene_scale"]

    srv_out = object_server_forward(
        server, jnp.broadcast_to(scene_scale, (B,)), pose["transl"],
        pose["global_orient"], obj_scale=nparams.get("obj_scale"),
    )
    tfs = srv_out.obj_tfs  # (B, 4, 4)
    time_code = nparams["frame_latent"][frame_idx]  # (B, 32)

    def sdf_at(pts_flat_c, n_pts):
        cond = jnp.zeros((pts_flat_c.shape[0], 0))
        return apply_implicit_net(
            nparams["implicit"], plans.implicit, pts_flat_c, cond,
            step=step, barf_cfg=plans.barf_cfg,
        )

    def sampler_sdf(pts_RS3):
        S = pts_RS3.shape[1]
        pts = pts_RS3.reshape(B, P * S, 3)
        x_c = object_deform(pts, tfs, inverse=True)
        return sdf_at(x_c.reshape(-1, 3), B * P * S)[:, 0].reshape(B * P, S)

    if z_vals is None:
        beta0 = jax.lax.stop_gradient(laplace_beta(nparams["density"]))
        z_vals = error_bound_z_vals(
            rng, sampler_sdf, ray_dirs, cam_loc, beta0, plans.sampler, training
        )
    S_f = z_vals.shape[1]

    points = cam_loc[:, None, :] + z_vals[:, :, None] * ray_dirs[:, None, :]
    pts = points.reshape(B, P * S_f, 3)

    if not training and _use_fused_render(plans):
        from ..ops.fused_query import pack_trunk_weights
        from ..ops.fused_render import (
            frame_bias0, fused_object_render, pack_color_weights,
            pack_trunk_transposed,
        )

        Rinv_f = inverse_mat3(tfs[:, :3, :3])
        tf12 = jnp.concatenate([Rinv_f.reshape(B, 9), tfs[:, :3, 3]], axis=-1)
        sdf_f, rgb_f, nrm_f, _, x_c = fused_object_render(
            pts, tf12,
            _fused_embed_plan(plans, step),
            pack_trunk_weights(nparams["implicit"], plans.implicit),
            pack_trunk_transposed(nparams["implicit"], plans.implicit),
            pack_color_weights(nparams["rendering"], nparams["implicit"]),
            frame_bias0(nparams["rendering"], jnp.zeros((B, 8), jnp.float32),
                        time_code=time_code),
            interpret=_fused_render_interpret(),
        )
        density = laplace_density(
            nparams["density"], sdf_f.reshape(-1)
        ).reshape(B * P, S_f, 1)
        semantics = jnp.zeros((B * P, S_f, MAX_CLASS)).at[
            :, :, plans.class_id
        ].set(1.0)
        factors = {
            "color": rgb_f.reshape(B * P, S_f, 3),
            "normal": nrm_f.reshape(B * P, S_f, 3),
            "density": density,
            "semantics": semantics,
            "z_vals": z_vals,
        }
        sample_dict = {
            "canonical_pts": x_c.reshape(B, P, S_f, 3),
            "tfs": tfs,
            "verts_posed": srv_out.verts,
        }
        return factors, sample_dict

    x_c = object_deform(pts, tfs, inverse=True)
    x_c_flat = x_c.reshape(-1, 3)
    N_pts = B * P * S_f

    if _use_fused_shade(plans):
        from ..ops.fused_query import pack_trunk_weights
        from ..ops.fused_render import (
            frame_bias0, pack_color_weights, pack_trunk_transposed,
        )
        from ..ops.fused_shade import fused_shade_train

        Rinv_fs = inverse_mat3(tfs[:, :3, :3])  # (B,3,3), grads flow to tfs
        jinv_bn = jnp.broadcast_to(
            Rinv_fs.reshape(B, 1, 9), (B, P * S_f, 9)
        )
        sdf_bn, rgb_bn, nrm_bn = fused_shade_train(
            x_c, jinv_bn,
            frame_bias0(nparams["rendering"],
                        jnp.zeros((B, 8), jnp.float32), time_code=time_code),
            _fused_embed_plan(plans, step),
            pack_trunk_weights(nparams["implicit"], plans.implicit),
            pack_trunk_transposed(nparams["implicit"], plans.implicit),
            pack_color_weights(nparams["rendering"], nparams["implicit"]),
            interpret=_fused_train_interpret(),
        )
        return _node_outputs(
            plans, z_vals, sdf_bn.reshape(-1), rgb_bn.reshape(-1, 3),
            nrm_bn.reshape(-1, 3), nparams, B, P, S_f,
        ), {
            "canonical_pts": x_c.reshape(B, P, S_f, 3),
            "sample_sdf": sdf_bn.reshape(B, P, S_f),
            "tfs": tfs,
            "verts_posed": srv_out.verts,
        }

    # rigid deformer: J = R (constant per frame), n = g R^-1 per point
    Rinv = inverse_mat3(tfs[:, :3, :3])  # (B, 3, 3)
    rinv_pp = jnp.broadcast_to(
        Rinv[:, None], (B, P * S_f, 3, 3)
    ).reshape(-1, 3, 3)
    tc_pp = _flat_per_point(time_code, P * S_f)
    view = -jnp.broadcast_to(ray_dirs[:, None, :], (B * P, S_f, 3)).reshape(-1, 3)

    imp_sh = _shade_params(nparams["implicit"])
    rend_sh = _shade_params(nparams["rendering"])

    def shade(xc, vw, jinv, tc):
        cond = jnp.zeros((xc.shape[0], 0))

        def field(p):
            h = apply_implicit_trunk(
                imp_sh, plans.implicit, p, cond,
                step=step, barf_cfg=plans.barf_cfg,
            )
            return implicit_sdf_from_trunk(nparams["implicit"], h), h

        (sdf, h_trunk), vjp = jax.vjp(field, xc)
        h_trunk = checkpoint_name(h_trunk, "saved")
        g = vjp((jnp.ones_like(sdf), jnp.zeros_like(h_trunk)))[0]
        g = g.astype(jnp.float32)
        feat = implicit_feat_from_trunk(imp_sh, h_trunk)
        nrm = jnp.einsum("ni,nij->nj", g, jinv)
        nrm = nrm / jnp.maximum(safe_norm(nrm, keepdims=True), 1e-6)
        rgb = apply_rendering_net(
            rend_sh, plans.rendering,
            xc, nrm, vw, jnp.zeros((xc.shape[0], 0)),
            jnp.concatenate([feat.astype(tc.dtype), tc], axis=-1),
            step=step, barf_cfg=plans.barf_cfg,
        )
        return sdf, rgb, nrm

    sdf_flat, rgb, normals = map_chunked(
        shade, (x_c_flat, view, rinv_pp, tc_pp), N_pts, remat=_shade_remat()
    )

    density = laplace_density(nparams["density"], sdf_flat).reshape(B * P, S_f, 1)
    semantics = jnp.zeros((B * P, S_f, MAX_CLASS)).at[:, :, plans.class_id].set(1.0)

    factors = {
        "color": rgb.reshape(B * P, S_f, 3),
        "normal": normals.reshape(B * P, S_f, 3),
        "density": density,
        "semantics": semantics,
        "z_vals": z_vals,
    }
    sample_dict = {
        "canonical_pts": x_c.reshape(B, P, S_f, 3),
        "sample_sdf": sdf_flat.reshape(B, P, S_f),
        "tfs": tfs,
        "verts_posed": srv_out.verts,
    }
    return factors, sample_dict


def _node_outputs(plans, z_vals, sdf_flat, rgb, normals, nparams, B, P, S_f):
    """Factors dict shared by the fused and chunked shade paths."""
    density = laplace_density(nparams["density"], sdf_flat).reshape(
        B * P, S_f, 1
    )
    semantics = jnp.zeros((B * P, S_f, MAX_CLASS)).at[
        :, :, plans.class_id
    ].set(1.0)
    return {
        "color": rgb.reshape(B * P, S_f, 3),
        "normal": normals.reshape(B * P, S_f, 3),
        "density": density,
        "semantics": semantics,
        "z_vals": z_vals,
    }


def _use_node_bounds() -> bool:
    """Per-node ray-interval tightening in the sampler stage (FLOP diet).
    Opt-in via HOLD_NODE_BOUNDS=1 until the accuracy A/B on TPU lands
    (docs/performance.md); default is the reference's full-range sampling
    (ray_sampler.py:139-141 samples every node over the scene sphere)."""
    return bool(os.environ.get("HOLD_NODE_BOUNDS"))


def _node_bound_sphere(verts_posed: jnp.ndarray, P: int, margin: float):
    """(B, V, 3) posed points -> per-ray (R, 3) centers + (R,) radii."""
    B = verts_posed.shape[0]
    center_b = jnp.mean(verts_posed, axis=1)  # (B, 3)
    rad_b = jnp.max(
        jnp.linalg.norm(verts_posed - center_b[:, None], axis=-1), axis=1
    ) * margin  # (B,)
    center = jnp.broadcast_to(center_b[:, None, :], (B, P, 3)).reshape(-1, 3)
    radius = jnp.broadcast_to(rad_b[:, None], (B, P)).reshape(-1)
    return jax.lax.stop_gradient(center), jax.lax.stop_gradient(radius)


def _use_fused_shade(plans: NodePlans) -> bool:
    """Fused training-shade kernel: TPU only, supported net shapes only.
    HOLD_NO_FUSED_TRAIN=1 forces the chunked XLA path (A/B runs);
    HOLD_FUSED_TRAIN=interpret forces the kernel in interpret mode on any
    backend (CPU end-to-end verification of the integration wiring).
    HOLD_NO_FUSED_RENDER implies HOLD_NO_FUSED_TRAIN: the render knob is the
    'force the layer-by-layer XLA path' A/B switch, and letting the fused
    TRAIN shade still run at inference would silently defeat that A/B."""
    if os.environ.get("HOLD_NO_FUSED_TRAIN") or os.environ.get(
        "HOLD_NO_FUSED_RENDER"
    ):
        return False
    if (
        jax.devices()[0].platform != "tpu"
        and os.environ.get("HOLD_FUSED_TRAIN") != "interpret"
    ):
        return False
    from ..ops.fused_render import supports_fused_render

    return supports_fused_render(plans.implicit, plans.rendering)


def _fused_train_interpret() -> bool:
    return os.environ.get("HOLD_FUSED_TRAIN") == "interpret"


def _shade_remat() -> bool:
    """Rematerialise the shading chunks in backward (default on).

    HOLD_NO_REMAT=1 stores all chunk activations instead — fits HBM at
    moderate ray counts and skips the backward recompute (A/B knob)."""
    return not os.environ.get("HOLD_NO_REMAT")


def _bf16_tree(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        tree,
    )


def _shade_params(net_params: dict) -> dict:
    """bf16 copy of MLP params for the shading path (TPU only).

    Mixed-precision shading: embeddings, the width-1 SDF head, the Laplace
    density, and all losses stay f32; the 256-wide trunk/rendering matmuls
    and their remat/backward chains run bf16 — they dominate the grad stage's
    HBM traffic.  The cast is differentiable, so f32 master params receive
    f32 gradient accumulation (standard mixed precision).  Set HOLD_SHADE_F32=1
    to force full f32 (A/B runs, debugging)."""
    if (
        jax.devices()[0].platform == "tpu"
        and not os.environ.get("HOLD_SHADE_F32")
    ):
        return _bf16_tree(net_params)
    return net_params


def _use_fused_query(plans: NodePlans) -> bool:
    """Fused sampler-query kernel: TPU only, supported trunk shapes only.
    HOLD_NO_FUSED_SAMPLER=1 forces the layer-by-layer XLA path (A/B runs)."""
    if os.environ.get("HOLD_NO_FUSED_SAMPLER"):
        return False
    if jax.devices()[0].platform != "tpu":
        return False
    from ..ops.fused_query import _RT, _T, supports_fused_query

    # z-table entry points expand points in-kernel; a tile of _RT rays must
    # split into whole _T-point slices (the kernels assert this), so small
    # dev shapes (e.g. -f's N_samples_eval=32) fall back to the XLA path
    return (
        supports_fused_query(plans.implicit)
        and (_RT * plans.sampler.N_samples_eval) % _T == 0
    )


def _sampler_relu() -> bool:
    """HOLD_SAMPLER_RELU=1: relu trunk activations in the fused sampler
    query kernels (hidden layers only; the fused path is already bf16 and
    the substitution error, <= log(2)/100 per activation, sits at the bf16
    noise floor).  Sampler-only — rendering/grad math is untouched."""
    return bool(os.environ.get("HOLD_SAMPLER_RELU"))


def _sampler_knn_stride() -> int:
    """HOLD_SAMPLER_KNN_STRIDE=n: subsample the MANO vertex table (every
    n-th vertex) for the SAMPLER-stage KNN only.  The top-K threshold
    extraction is the sampler's dominant VPU cost and scales linearly in V;
    sample placement tolerates the coarser skinning field.  Default 1
    (exact, reference semantics).  The grad-stage warp always uses all
    778 vertices."""
    return max(1, int(os.environ.get("HOLD_SAMPLER_KNN_STRIDE", "1")))


def _use_fused_render(plans: NodePlans) -> bool:
    """Fused inference render kernel: TPU only, supported net shapes only.
    HOLD_NO_FUSED_RENDER=1 forces the layer-by-layer XLA path (A/B runs);
    HOLD_FUSED_RENDER=interpret forces the kernel in interpret mode on any
    backend (CPU end-to-end verification of the integration wiring)."""
    if os.environ.get("HOLD_NO_FUSED_RENDER"):
        return False
    if (
        jax.devices()[0].platform != "tpu"
        and os.environ.get("HOLD_FUSED_RENDER") != "interpret"
    ):
        return False
    from ..ops.fused_render import supports_fused_render

    return supports_fused_render(plans.implicit, plans.rendering)


def _fused_render_interpret() -> bool:
    return os.environ.get("HOLD_FUSED_RENDER") == "interpret"


def _fused_embed_plan(plans: NodePlans, step):
    """(EMB_ROWS, 8) embed plan with the node's BARF window baked in."""
    from ..models.embedders import barf_alpha, barf_weights
    from ..ops.fused_query import embed_plan

    plan = plans.implicit
    if plan["embedding"] == "barf" and step is not None:
        L = plan["multires"]
        alpha = barf_alpha(step, L, *plans.barf_cfg)
        wf = barf_weights(alpha, L)
        window = jnp.concatenate(
            [jnp.ones((3,), jnp.float32), jnp.repeat(wf, 6)]
        )
    else:
        window = None
    return embed_plan(plan["multires"], window)


def mano_node_sample_z(nparams, server, plans, batch, ray_dirs, cam_loc,
                       step, epoch, rng, training, proposal_mode=False):
    """Sampler-only stage for the MANO node (stop-gradient z table).

    The SDF queries here only *rank and place* samples (the reference runs
    them under no_grad); they execute with bf16 matmuls — sample placement
    tolerates the reduced precision and the MXU runs ~2x faster, while all
    rendering/integration math stays f32.

    proposal_mode=True (static): table-building queries run through the
    distilled proposal net instead of the 8x256 trunk (~40x fewer query
    FLOPs; see models/mlp.py proposal section). The final shade pass is
    exact either way."""
    B, P = batch["uv"].shape[:2]
    frame_idx = batch["frame_idx"]
    pose = gather_mano_pose(nparams["tables"], frame_idx)
    full_pose = jnp.concatenate([pose["global_orient"], pose["pose"]], axis=-1)
    srv_out = mano_server_forward(
        server, jnp.broadcast_to(batch["scene_scale"], (B,)), pose["transl"],
        full_pose, pose["betas"],
    )
    cond_pose = full_pose[:, 3:] / np.pi
    if training and epoch is not None:
        cond_pose = jnp.where(epoch < 20, 0.0, 1.0) * cond_pose
    tfs = srv_out.tfs
    verts_posed = srv_out.verts
    skin_w = jnp.broadcast_to(
        server.skin_weights_c, (B,) + server.skin_weights_c.shape[1:]
    )

    resolved = resolve_weight_norm(nparams["implicit"])
    implicit_bf16 = _bf16_tree(resolved)
    use_proposal = (
        proposal_mode and plans.proposal is not None
        and "proposal" in nparams
    )
    fused = _use_fused_query(plans) and not use_proposal

    query_z = None
    if use_proposal:
        from .mlp import apply_proposal_net

        stride = _sampler_knn_stride()
        q_verts = verts_posed[:, ::stride] if stride > 1 else verts_posed
        q_skin = skin_w[:, ::stride] if stride > 1 else skin_w
        prop_bf16 = _bf16_tree(nparams["proposal"])

        def query_z(z_RS):
            S = z_RS.shape[1]
            pts = (
                cam_loc[:, None, :] + z_RS[:, :, None] * ray_dirs[:, None, :]
            ).reshape(B, P * S, 3)
            x_c, _ = knn_inverse_warp(
                pts, q_verts, q_skin, tfs,
                K=plans.knn_k, max_dist=plans.max_dist,
            )
            sdf = apply_proposal_net(
                prop_bf16, plans.proposal, x_c.reshape(-1, 3),
                step=step, barf_cfg=plans.barf_cfg,
                embedding=plans.implicit["embedding"],
            )
            # same truncation as the distillation target (holdnet.py):
            # density is saturated out there for any admissible beta
            clip_v = 2.0 * plans.sampler.scene_bounding_sphere
            return jnp.clip(sdf, -clip_v, clip_v).reshape(B * P, S)
    if fused:
        from ..ops.fused_query import (
            fused_hand_sampler_sdf_z, pack_rays8, pack_trunk_weights,
        )
        pack = pack_trunk_weights(resolved, plans.implicit)
        plan_arr = _fused_embed_plan(plans, step)
        S_eval = plans.sampler.N_samples_eval
        rays8 = pack_rays8(ray_dirs, cam_loc, B, P, S_eval)
        stride = _sampler_knn_stride()
        q_verts = verts_posed[:, ::stride] if stride > 1 else verts_posed
        q_skin = skin_w[:, ::stride] if stride > 1 else skin_w
        relu = _sampler_relu()

        def query_z(z_RS):
            # single Pallas kernel: in-kernel cam + z*dir expansion + KNN
            # warp + PE + bf16 trunk + f32 head, weights VMEM-resident
            sdf = fused_hand_sampler_sdf_z(
                rays8, z_RS.reshape(B, P, -1), q_verts, q_skin, tfs,
                plan_arr, pack, K=plans.knn_k, relu=relu,
            )
            return sdf.reshape(B * P, -1)

    def sampler_sdf(pts_RS3):
        S = pts_RS3.shape[1]
        pts = pts_RS3.reshape(B, P * S, 3)
        x_c, _ = knn_inverse_warp(
            pts, verts_posed, skin_w, tfs,
            K=plans.knn_k, max_dist=plans.max_dist,
        )
        # trunk + width-1 SDF head: the sampler never needs the 256-wide
        # feature head, and slicing it off explicitly keeps the (N, 257)
        # output from ever materializing (45-d cond is CVPR-zeroed)
        h = apply_implicit_trunk(
            implicit_bf16, plans.implicit,
            x_c.reshape(-1, 3), None,
            step=step, barf_cfg=plans.barf_cfg,
        )
        out = implicit_sdf_from_trunk(implicit_bf16, h)
        return out.astype(jnp.float32).reshape(B * P, S)

    near_n = far_n = None
    if _use_node_bounds():
        c_r, r_r = _node_bound_sphere(verts_posed, P, 1.15)
        near_n, far_n = node_ray_interval(
            cam_loc, ray_dirs, c_r, r_r + plans.max_dist, plans.sampler
        )
    beta0 = jax.lax.stop_gradient(laplace_beta(nparams["density"]))
    return error_bound_z_vals(
        rng, sampler_sdf, ray_dirs, cam_loc, beta0, plans.sampler, training,
        query_z_fn=query_z, near=near_n, far=far_n,
    )


def object_node_sample_z(nparams, server, plans, batch, ray_dirs, cam_loc,
                         step, epoch, rng, training, proposal_mode=False):
    """Sampler-only stage for the object node."""
    B, P = batch["uv"].shape[:2]
    pose = gather_object_pose(nparams["tables"], batch["frame_idx"])
    srv_out = object_server_forward(
        server, jnp.broadcast_to(batch["scene_scale"], (B,)), pose["transl"],
        pose["global_orient"], obj_scale=nparams.get("obj_scale"),
    )
    tfs = srv_out.obj_tfs
    resolved = resolve_weight_norm(nparams["implicit"])
    implicit_bf16 = _bf16_tree(resolved)
    use_proposal = (
        proposal_mode and plans.proposal is not None
        and "proposal" in nparams
    )
    fused = _use_fused_query(plans) and not use_proposal

    query_z = None
    if use_proposal:
        from .mlp import apply_proposal_net

        prop_bf16 = _bf16_tree(nparams["proposal"])

        def query_z(z_RS):
            S = z_RS.shape[1]
            pts = (
                cam_loc[:, None, :] + z_RS[:, :, None] * ray_dirs[:, None, :]
            ).reshape(B, P * S, 3)
            x_c = object_deform(pts, tfs, inverse=True)
            sdf = apply_proposal_net(
                prop_bf16, plans.proposal, x_c.reshape(-1, 3),
                step=step, barf_cfg=plans.barf_cfg,
                embedding=plans.implicit["embedding"],
            )
            # same truncation as the distillation target (holdnet.py):
            # density is saturated out there for any admissible beta
            clip_v = 2.0 * plans.sampler.scene_bounding_sphere
            return jnp.clip(sdf, -clip_v, clip_v).reshape(B * P, S)
    if fused:
        from ..ops.fused_query import (
            fused_object_sampler_sdf_z, pack_rays8, pack_trunk_weights,
        )
        pack = pack_trunk_weights(resolved, plans.implicit)
        plan_arr = _fused_embed_plan(plans, step)
        Rinv = inverse_mat3(tfs[:, :3, :3])
        tf12 = jnp.concatenate(
            [Rinv.reshape(B, 9), tfs[:, :3, 3]], axis=-1
        )
        rays8 = pack_rays8(ray_dirs, cam_loc, B, P, plans.sampler.N_samples_eval)
        relu = _sampler_relu()

        def query_z(z_RS):
            sdf = fused_object_sampler_sdf_z(
                rays8, z_RS.reshape(B, P, -1), tf12, plan_arr, pack,
                relu=relu,
            )
            return sdf.reshape(B * P, -1)

    def sampler_sdf(pts_RS3):
        S = pts_RS3.shape[1]
        pts = pts_RS3.reshape(B, P * S, 3)
        x_c = object_deform(pts, tfs, inverse=True)
        cond = jnp.zeros((B * P * S, 0), jnp.bfloat16)
        h = apply_implicit_trunk(
            implicit_bf16, plans.implicit,
            x_c.reshape(-1, 3), cond,
            step=step, barf_cfg=plans.barf_cfg,
        )
        out = implicit_sdf_from_trunk(implicit_bf16, h)
        return out.astype(jnp.float32).reshape(B * P, S)

    near_n = far_n = None
    if _use_node_bounds():
        # SfM-point bound with a generous margin: the object's SDF surface
        # can exceed the sparse cloud (meshing grids 2x its bbox), and early
        # training starts from the geometric-init sphere — floor the radius
        # so that sphere is always inside the interval.
        c_r, r_r = _node_bound_sphere(srv_out.verts, P, 1.75)
        r_r = jnp.maximum(r_r, 0.25 * plans.sampler.scene_bounding_sphere)
        near_n, far_n = node_ray_interval(
            cam_loc, ray_dirs, c_r, r_r, plans.sampler
        )
    beta0 = jax.lax.stop_gradient(laplace_beta(nparams["density"]))
    return error_bound_z_vals(
        rng, sampler_sdf, ray_dirs, cam_loc, beta0, plans.sampler, training,
        query_z_fn=query_z, near=near_n, far=far_n,
    )
