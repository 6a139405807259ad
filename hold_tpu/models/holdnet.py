"""Scene composition: nodes + NeRF++ background + loss-target preparation.

The TPU counterpart of code/src/hold/hold_net.py + hold_utils.py: a pure
function from (params, batch, rng, step) to rendered outputs and loss targets.
Static scene state (MANO/object servers, network plans, subdivision operators)
lives in a `Scene` object captured by the jit closure; everything trainable is
in the `params` pytree; the object's canonical mesh (refreshed by host-side
marching cubes between epochs) rides in a fixed-shape `mesh_state` pytree.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..mano.server import ManoServerState, build_mano_server
from ..ops.point_mesh import (
    check_off_in_surface,
    face_circumradius_bound,
    off_surface_by_vertex_bound,
    signed_distance_to_mesh,
)
from ..ops.sampling import (
    HAND_GLOBAL_SIGMA_XYZ,
    point_in_space_sample,
    sample_on_mesh_barycentric,
)
from ..render.background import background_forward, background_plans, init_background
from ..render.ray_sampler import SamplerConfig, inverse_sphere_z_vals
from ..render.volsdf import get_camera_rays, merge_factors, volumetric_render
from ..utils.mesh import mano_subdivision_operator
from .mlp import (
    implicit_net_shapes,
    init_implicit_net,
    init_proposal_net,
    init_rendering_net,
    proposal_net_shapes,
    rendering_net_shapes,
)
from .density import init_laplace_density
from .nodes import (
    NodePlans,
    mano_node_forward,
    object_node_forward,
)
from .object_model import ObjectServerState, build_object_server
from .specs import CLASS_IDS, MANO_SPECS, OBJECT_SPECS, TIME_CODE_DIM

OBJ_MESH_MAX_V = 8192
OBJ_MESH_MAX_F = 16384
PAD_FAR = 1e6


@dataclass
class Scene:
    node_ids: tuple  # subset of ("right", "left", "object"), object last
    servers: dict  # node_id -> ManoServerState | ObjectServerState
    plans: dict  # node_id -> NodePlans
    bg_plans: dict
    scene_scale: float
    n_frames: int
    sampler_cfg: SamplerConfig
    sub_ops: dict = field(default_factory=dict)  # hand id -> (M_sub, faces_div)
    opt_model: dict = field(default_factory=dict)
    args: dict = field(default_factory=dict)


def build_scene(opt_model, args, scene_data: dict) -> Scene:
    """scene_data: parsed data.npy 'entities' + scene metadata (see data.dataset)."""
    entities = scene_data["entities"]
    node_ids = tuple(
        [k for k in ("right", "left") if k in entities] + ["object"]
    )
    sampler_cfg = SamplerConfig(
        near=opt_model["ray_sampler"]["near"],
        N_samples=opt_model["ray_sampler"]["N_samples"],
        N_samples_eval=opt_model["ray_sampler"]["N_samples_eval"],
        N_samples_extra=opt_model["ray_sampler"]["N_samples_extra"],
        eps=opt_model["ray_sampler"]["eps"],
        beta_iters=opt_model["ray_sampler"]["beta_iters"],
        max_total_iters=opt_model["ray_sampler"]["max_total_iters"],
        add_tiny=opt_model["ray_sampler"]["add_tiny"],
        scene_bounding_sphere=opt_model["scene_bounding_sphere"],
        inverse_sphere_bg=True,
        conv_check=opt_model["ray_sampler"].get("conv_check", "current"),
    )
    barf_cfg = (int(args.get("barf_s", 1000)), int(args.get("barf_e", 10000)))
    import os as _os

    prop_cfg = dict(opt_model.get("proposal", {}))
    prop_enabled = bool(prop_cfg.get("enabled", False)) and not _os.environ.get(
        "HOLD_NO_PROPOSAL"
    )
    prop_plan = proposal_net_shapes(prop_cfg) if prop_enabled else None

    servers: dict[str, Any] = {}
    plans: dict[str, NodePlans] = {}
    sub_ops = {}
    for nid in node_ids:
        if nid in ("right", "left"):
            servers[nid] = build_mano_server(
                nid == "right", entities[nid]["mean_shape"],
                model_dir=args.get("mano_dir"),
            )
            plans[nid] = NodePlans(
                implicit=implicit_net_shapes(opt_model["implicit_network"], MANO_SPECS),
                rendering=rendering_net_shapes(
                    opt_model["rendering_network"], MANO_SPECS
                ),
                sampler=sampler_cfg,
                barf_cfg=barf_cfg,
                node_id=nid,
                class_id=CLASS_IDS[nid],
                proposal=prop_plan,
            )
            sub_ops[nid] = mano_subdivision_operator(
                servers[nid].consts.faces, nid == "right"
            )
        else:
            obj = entities["object"]
            servers[nid] = build_object_server(
                obj["pts.cano"], obj["obj_scale"], obj["norm_mat"]
            )
            # object rendering net takes the 32-d per-frame time code appended
            # to its input features (object_node.py:19-20)
            obj_render_opt = dict(opt_model["rendering_network"])
            obj_render_opt["d_in"] = obj_render_opt["d_in"] + TIME_CODE_DIM
            plans[nid] = NodePlans(
                implicit=implicit_net_shapes(
                    opt_model["implicit_network"], OBJECT_SPECS
                ),
                rendering=rendering_net_shapes(obj_render_opt, OBJECT_SPECS),
                sampler=sampler_cfg,
                barf_cfg=barf_cfg,
                node_id=nid,
                class_id=CLASS_IDS[nid],
                proposal=prop_plan,
            )
    return Scene(
        node_ids=node_ids,
        servers=servers,
        plans=plans,
        bg_plans=background_plans(opt_model),
        scene_scale=float(scene_data["scale"]),
        n_frames=int(scene_data["n_frames"]),
        sampler_cfg=sampler_cfg,
        sub_ops={k: (jnp.asarray(v[0]), v[1]) for k, v in sub_ops.items()},
        opt_model=opt_model,
        args=dict(args),
    )


def init_scene_params(rng, scene: Scene, scene_data: dict) -> dict:
    """Trainable pytree: per-node nets + density + pose tables, background."""
    entities = scene_data["entities"]
    params: dict[str, Any] = {}
    opt_model = scene.opt_model
    for nid in scene.node_ids:
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        if nid in ("right", "left"):
            e = entities[nid]
            node = {
                "implicit": init_implicit_net(
                    k1, opt_model["implicit_network"], MANO_SPECS
                ),
                "rendering": init_rendering_net(
                    k2, opt_model["rendering_network"], MANO_SPECS
                ),
                "density": init_laplace_density(
                    opt_model["density"]["params_init"],
                    opt_model["density"]["beta_min"],
                ),
                "tables": {
                    "betas": jnp.asarray(e["mean_shape"], jnp.float32)[None],
                    "global_orient": jnp.asarray(
                        e["hand_poses"][:, :3], jnp.float32
                    ),
                    "pose": jnp.asarray(e["hand_poses"][:, 3:], jnp.float32),
                    "transl": jnp.asarray(e["hand_trans"], jnp.float32),
                },
            }
        else:
            e = entities["object"]
            obj_render_opt = dict(opt_model["rendering_network"])
            obj_render_opt["d_in"] = obj_render_opt["d_in"] + TIME_CODE_DIM
            node = {
                "implicit": init_implicit_net(
                    k1, opt_model["implicit_network"], OBJECT_SPECS
                ),
                "rendering": init_rendering_net(k2, obj_render_opt, OBJECT_SPECS),
                "density": init_laplace_density(
                    opt_model["density"]["params_init"],
                    opt_model["density"]["beta_min"],
                ),
                "tables": {
                    "global_orient": jnp.asarray(
                        e["object_poses"][:, :3], jnp.float32
                    ),
                    "transl": jnp.asarray(e["object_poses"][:, 3:], jnp.float32),
                },
                "frame_latent": jax.random.normal(
                    k3, (scene.n_frames, TIME_CODE_DIM)
                ),
                "obj_scale": jnp.asarray(float(e["obj_scale"]), jnp.float32),
            }
        if scene.plans[nid].proposal is not None:
            rng, kp = jax.random.split(rng)
            node["proposal"] = init_proposal_net(
                kp, opt_model.get("proposal", {})
            )
        params[nid] = node
    rng, kb = jax.random.split(rng)
    params["background"] = init_background(kb, opt_model, scene.n_frames)
    return params


def empty_object_mesh_state() -> dict:
    """Fixed-shape buffers for the object's marching-cubes canonical mesh."""
    return {
        "tri": jnp.full((OBJ_MESH_MAX_F, 3, 3), PAD_FAR, jnp.float32),
        "centers": jnp.zeros((16384, 3), jnp.float32),
        # off-surface bound sweep: unique verts only, FAR-padded (a padded
        # row can never be the min distance) — half the 500k x 16k sweep the
        # cyclically-tiled eikonal buffer would cost
        "bound_centers": jnp.full((8192, 3), 1e4, jnp.float32),
        "sigma_xyz": jnp.ones((3,), jnp.float32),
        "h_margin": jnp.asarray(0.0, jnp.float32),
        "valid": jnp.asarray(0.0, jnp.float32),
    }


def object_mesh_state_from_mesh(vertices: np.ndarray, faces: np.ndarray) -> dict:
    # decimate so the vertex set fits the fixed buffers (the vertex-distance
    # off-surface bound needs EVERY vertex present, not a truncation)
    from ..utils.mesh import decimate_mesh

    if faces.shape[0] > OBJ_MESH_MAX_F or vertices.shape[0] > 8192:
        # vertex-clustering can overshoot its face target, so walk the
        # target down until the vertex set fits the fixed bound buffer
        target = OBJ_MESH_MAX_F // 2
        for _ in range(8):
            m = decimate_mesh(vertices, faces, target)
            if m.vertices.shape[0] <= 8192:
                break
            target = max(int(target * 0.55), 500)
        vertices, faces = m.vertices, m.faces
        if vertices.shape[0] > 8192:
            # Truncating the vertex set would LOOSEN the off-surface bound
            # (missing verts -> overestimated distance -> near-surface points
            # misclassified as off-surface), so fall back to an invalid state
            # (valid=0 disables the bound) rather than corrupting the loss.
            import logging

            logging.getLogger("hold_tpu").warning(
                "object mesh kept %d verts after 8 decimation rounds "
                "(limit 8192); disabling the off-surface vertex bound",
                vertices.shape[0],
            )
            return empty_object_mesh_state()
    tri = np.full((OBJ_MESH_MAX_F, 3, 3), PAD_FAR, np.float32)
    F = min(faces.shape[0], OBJ_MESH_MAX_F)
    tri[:F] = vertices[faces[:F]]
    sigma = np.abs(vertices).max(axis=0) * 1.1
    # fixed-size eikonal centers: every vertex, tiled cyclically (sampling
    # substrate — duplicates are harmless there)
    reps = int(np.ceil(16384 / max(vertices.shape[0], 1)))
    centers = np.tile(vertices, (reps, 1))[:16384].astype(np.float32)
    # bound centers: unique verts, FAR padding (min distance unaffected)
    bound = np.full((8192, 3), 1e4, np.float32)
    bound[: vertices.shape[0]] = vertices
    h = float(np.asarray(face_circumradius_bound(
        np.asarray(vertices, np.float32), np.asarray(faces)
    )))
    return {
        "tri": jnp.asarray(tri),
        "centers": jnp.asarray(centers),
        "bound_centers": jnp.asarray(bound),
        "sigma_xyz": jnp.asarray(sigma, jnp.float32),
        "h_margin": jnp.asarray(h, jnp.float32),
        "valid": jnp.asarray(1.0, jnp.float32),
    }


# --------------------------------------------------------------------------
# Loss-target preparation (hold_utils.py:149-240)
# --------------------------------------------------------------------------

def _eikonal_grad_samples(rng, nparams, plans, cond_pose, centers, local_sigma,
                          sigma_xyz, step, num_samples=256):
    """Sample around `centers` (B, V, 3), return grad of the SDF there."""
    B = centers.shape[0]
    k1, k2 = jax.random.split(rng)
    V = centers.shape[1]
    idx = jax.random.permutation(k1, V)[:num_samples]
    sub = centers[:, idx]
    pts = point_in_space_sample(k2, sub, local_sigma, sigma_xyz, 0.20)
    N = pts.shape[1]

    def sdf_sum(p_flat):
        from .mlp import apply_implicit_trunk, implicit_sdf_from_trunk
        from .nodes import _flat_per_point

        cond = (
            _flat_per_point(cond_pose, N)
            if cond_pose is not None and cond_pose.shape[-1] > 0
            else jnp.zeros((p_flat.shape[0], 0))
        )
        h = apply_implicit_trunk(
            nparams["implicit"], plans.implicit, p_flat, cond, step=step,
            barf_cfg=plans.barf_cfg,
        )
        return jnp.sum(implicit_sdf_from_trunk(nparams["implicit"], h))

    grads = jax.grad(sdf_sum)(pts.reshape(-1, 3))
    return grads.reshape(B, N, 3)


def prepare_loss_targets_hand(
    rng, nparams, scene: Scene, nid: str, sample_dict: dict, step
) -> dict:
    plans = scene.plans[nid]
    server: ManoServerState = scene.servers[nid]
    M_sub, faces_div = scene.sub_ops[nid]
    faces_div_j = jnp.asarray(faces_div)

    out = {}
    B, P, S_f, _ = sample_dict["canonical_pts"].shape
    cond_pose = sample_dict["cond_pose"]

    # subdivided sealed canonical mesh from the current batch's first frame —
    # recomputed every step as one matmul (vs the 200-step stale respawn at
    # hold_net.py:163-167); gated to match the reference's spawn schedule.
    v_div = (M_sub @ sample_dict["v_posed"][0]).astype(jnp.float32)  # (Vd, 3)
    v_div_b = jnp.broadcast_to(v_div[None], (B,) + v_div.shape)

    k1, k2, k3 = jax.random.split(rng, 3)
    surf = sample_on_mesh_barycentric(k1, v_div_b, faces_div_j, 256)
    samples = point_in_space_sample(k2, surf, 0.008, HAND_GLOBAL_SIGMA_XYZ, 0.20)
    Ns = samples.shape[1]

    gt_sdf = jax.vmap(
        lambda p: signed_distance_to_mesh(p, v_div, faces_div_j)
    )(samples)
    # detached GT, like the reference (loss.py:62)
    out["pts2mano_sdf_cano"] = jax.lax.stop_gradient(gt_sdf)  # (B, Ns)

    from .mlp import apply_implicit_net
    from .nodes import _flat_per_point

    pred = apply_implicit_net(
        nparams["implicit"], plans.implicit, samples.reshape(-1, 3),
        _flat_per_point(cond_pose, Ns), step=step, barf_cfg=plans.barf_cfg,
    )
    out["pred_sdf"] = pred[:, 0].reshape(B, Ns)

    # off-surface classification is index computation, not a loss surface —
    # the reference's kaolin ops are non-differentiable anyway; the exact
    # triangle sweep is replaced by the conservative vertex-distance bound
    # (ops/point_mesh.py:off_surface_by_vertex_bound)
    cano_pts = jax.lax.stop_gradient(
        sample_dict["canonical_pts"].reshape(-1, 3)
    )
    h_margin = face_circumradius_bound(v_div, faces_div_j)
    out["index_off_surface"] = off_surface_by_vertex_bound(
        cano_pts, v_div, B * P, 0.01, h_margin
    )

    verts_c = jnp.broadcast_to(server.verts_c, (B,) + server.verts_c.shape[1:])
    out["grad_theta"] = _eikonal_grad_samples(
        k3, nparams, plans, cond_pose, verts_c, 0.008, HAND_GLOBAL_SIGMA_XYZ, step
    )
    # the reference only activates these targets once the cano mesh exists
    # (first spawn at step 200, hold_net.py:163)
    out["active"] = (step >= 200).astype(jnp.float32)
    return out


def prepare_loss_targets_object(
    rng, nparams, scene: Scene, sample_dict: dict, mesh_state: dict, step
) -> dict:
    plans = scene.plans["object"]
    out = {}
    B, P, S_f, _ = sample_dict["canonical_pts"].shape

    cano_pts = jax.lax.stop_gradient(
        sample_dict["canonical_pts"].reshape(-1, 3)
    )
    # conservative vertex-distance bound against the cached mesh vertex set
    # (validity gated by mesh_state['valid'])
    out["index_off_surface"] = off_surface_by_vertex_bound(
        cano_pts, mesh_state["bound_centers"], B * P, 0.05,
        mesh_state["h_margin"]
    )

    # eikonal samples around the object cano mesh vertices
    centers = jnp.broadcast_to(
        mesh_state["centers"][None], (B,) + mesh_state["centers"].shape
    )
    k1, _ = jax.random.split(rng)
    out["grad_theta"] = _eikonal_grad_samples(
        k1, nparams, plans, None, centers, 0.03, mesh_state["sigma_xyz"], step
    )
    out["active"] = mesh_state["valid"]
    return out


# --------------------------------------------------------------------------
# Full scene forward
# --------------------------------------------------------------------------

def sample_all_z(
    params: dict,
    scene: Scene,
    batch: dict,
    rng,
    step,
    epoch,
    training: bool = True,
    proposal_mode: bool = False,
) -> dict:
    """Sampler-only stage: per-node error-bound z tables (stop-gradient).

    Jitted separately from the render/grad stage — the combined graph is too
    large for the TPU compiler's fusion pass (it SIGILLs), and since z values
    carry no gradient there is nothing to fuse across the boundary anyway."""
    from .nodes import mano_node_sample_z, object_node_sample_z

    B, P = batch["uv"].shape[:2]
    ray_dirs_b, cam_loc_b = get_camera_rays(
        batch["uv"], batch["extrinsics"], batch["intrinsics"]
    )
    ray_dirs = ray_dirs_b.reshape(-1, 3)
    cam_loc = jnp.broadcast_to(cam_loc_b[:, None, :], (B, P, 3)).reshape(-1, 3)
    keys = (
        jax.random.split(rng, len(scene.node_ids))
        if rng is not None else [None] * len(scene.node_ids)
    )
    out = {}
    for i, nid in enumerate(scene.node_ids):
        fn = mano_node_sample_z if nid in ("right", "left") else object_node_sample_z
        out[nid] = fn(
            params[nid], scene.servers[nid], scene.plans[nid], batch,
            ray_dirs, cam_loc, step, epoch, keys[i], training,
            proposal_mode=proposal_mode,
        )
    return out


def holdnet_forward(
    params: dict,
    scene: Scene,
    batch: dict,
    mesh_state: dict,
    rng,
    step,
    epoch,
    training: bool = True,
    z_vals_dict: dict | None = None,
) -> dict:
    """batch: frame_idx (B,), uv (B,P,2), intrinsics (B,4,4), extrinsics
    (B,4,4), scene_scale scalar.  Returns composited render + loss targets."""
    B, P = batch["uv"].shape[:2]
    ray_dirs_b, cam_loc_b = get_camera_rays(
        batch["uv"], batch["extrinsics"], batch["intrinsics"]
    )
    ray_dirs = ray_dirs_b.reshape(-1, 3)
    cam_loc = jnp.broadcast_to(
        cam_loc_b[:, None, :], (B, P, 3)
    ).reshape(-1, 3)

    out: dict[str, Any] = {}
    factors_list = []
    sample_dicts = {}
    keys = (
        jax.random.split(rng, len(scene.node_ids) + 3)
        if rng is not None
        else [None] * (len(scene.node_ids) + 3)
    )
    for i, nid in enumerate(scene.node_ids):
        z_nid = None if z_vals_dict is None else z_vals_dict[nid]
        if nid in ("right", "left"):
            factors, sd = mano_node_forward(
                params[nid], scene.servers[nid], scene.plans[nid], batch,
                ray_dirs, cam_loc, step, epoch, keys[i], training,
                z_vals=z_nid,
            )
        else:
            factors, sd = object_node_forward(
                params[nid], scene.servers[nid], scene.plans[nid], batch,
                ray_dirs, cam_loc, step, epoch, keys[i], training,
                z_vals=z_nid,
            )
        factors_list.append(factors)
        sample_dicts[nid] = sd

    # loss targets
    if training:
        krest = keys[len(scene.node_ids)]
        for nid in scene.node_ids:
            krest, k = jax.random.split(krest)
            if nid in ("right", "left"):
                tgt = prepare_loss_targets_hand(
                    k, params[nid], scene, nid, sample_dicts[nid], step
                )
            else:
                tgt = prepare_loss_targets_object(
                    k, params[nid], scene, sample_dicts[nid], mesh_state, step
                )
            for tk, tv in tgt.items():
                out[f"{nid}.{tk}"] = tv
            # proposal distillation (sampler FLOP diet): regress the small
            # surrogate onto the trunk's sdf at a strided subset of this
            # step's actual ray samples — exactly the query distribution the
            # sampler sees.  stop_gradient on BOTH points and targets: the
            # proposal loss must touch only proposal params.
            if "proposal" in params[nid] and "sample_sdf" in sample_dicts[nid]:
                from .mlp import apply_proposal_net

                plans_n = scene.plans[nid]
                pts_p = jax.lax.stop_gradient(
                    sample_dicts[nid]["canonical_pts"][:, :, ::6]
                ).reshape(-1, 3)
                # truncate the regression target: far samples carry sdf
                # magnitudes up to ~scene_size/obj_scale (canonical units),
                # which the bounded-PE surrogate cannot represent — the L1
                # then grows with |target| and dominates the total loss.
                # Laplace density is fully saturated at |sdf| >= 2R for any
                # admissible beta, so placement semantics are unchanged.
                clip_v = 2.0 * scene.sampler_cfg.scene_bounding_sphere
                tgt_p = jnp.clip(
                    jax.lax.stop_gradient(
                        sample_dicts[nid]["sample_sdf"][:, :, ::6]
                    ).reshape(-1),
                    -clip_v, clip_v,
                )
                out[f"{nid}.proposal_pred"] = apply_proposal_net(
                    params[nid]["proposal"], plans_n.proposal, pts_p,
                    step=step, barf_cfg=plans_n.barf_cfg,
                    embedding=plans_n.implicit["embedding"],
                )
                out[f"{nid}.proposal_tgt"] = tgt_p

    merged = merge_factors(factors_list, num_nodes=len(factors_list))
    comp = volumetric_render(merged, training)
    out.update(comp)

    # per-node renders (used by semantics-vis + per-node mask losses)
    for nid, factors in zip(scene.node_ids, factors_list):
        f = dict(factors)
        f["z_max"] = f["z_vals"][:, -1]
        node_out = volumetric_render(f, training)
        for k, v in node_out.items():
            out[f"{nid}.{k}"] = v

    # background
    radius = scene.sampler_cfg.scene_bounding_sphere
    bg_z = inverse_sphere_z_vals(
        keys[len(scene.node_ids) + 1], B * P,
        scene.sampler_cfg.N_samples_inverse_sphere, training,
    ) * (1.0 / radius)
    frame_idx_per_ray = jnp.broadcast_to(
        batch["frame_idx"][:, None], (B, P)
    ).reshape(-1)
    bg = background_forward(
        params["background"], scene.bg_plans, out["bg_weights"], ray_dirs,
        cam_loc, bg_z, frame_idx_per_ray, radius, step=step,
    )

    out["rgb"] = out["fg_rgb"] + bg["bg_rgb"]
    out["semantics"] = out["fg_semantics"] + bg["bg_semantics"]
    if not training:
        out["bg_rgb_only"] = bg["bg_rgb_only"]
        out["instance_map"] = jnp.argmax(out["semantics"], axis=1)
    return out
