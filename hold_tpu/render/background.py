"""NeRF++ background: inverse-sphere parameterisation + frame-coded radiance.

Functional port of the reference Background module
(code/src/model/renderables/background.py:9-169): points beyond the scene
bounding sphere are parameterised as (unit direction on the sphere, inverse
depth), fed to a frame-latent-conditioned implicit net, rendered with
AbsDensity, and composited under the foreground's leftover transmittance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.density import abs_density
from ..models.mlp import (
    apply_implicit_net,
    apply_rendering_net,
    implicit_net_shapes,
    init_implicit_net,
    init_rendering_net,
    rendering_net_shapes,
)

BG_SPECS = {"pose_dim": 45, "embedding": "fourier"}
MAX_CLASS = 4


def init_background(rng, opt_model, num_frames: int) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    dim_frame = opt_model["bg_rendering_network"]["dim_frame_encoding"]
    return {
        "implicit": init_implicit_net(
            k1, opt_model["bg_implicit_network"], BG_SPECS
        ),
        "rendering": init_rendering_net(
            k2, opt_model["bg_rendering_network"], BG_SPECS
        ),
        "frame_latent": jax.random.normal(k3, (num_frames, dim_frame)),
    }


def background_plans(opt_model):
    return {
        "implicit": implicit_net_shapes(opt_model["bg_implicit_network"], BG_SPECS),
        "rendering": rendering_net_shapes(opt_model["bg_rendering_network"], BG_SPECS),
    }


def depth2pts_outside(ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                      depth: jnp.ndarray, radius: float) -> jnp.ndarray:
    """Inverse-sphere point parameterisation (background.py:102-135).

    ray_o/ray_d: (R, S, 3); depth: (R, S) inverse distance in [0, 1].
    Returns (R, S, 4): unit point on/beyond the sphere + inverse depth."""
    from ..utils.transforms import safe_norm

    o_dot_d = jnp.sum(ray_d * ray_o, axis=-1)
    under = o_dot_d**2 - (jnp.sum(ray_o**2, -1) - radius**2)
    d_sphere = jnp.sqrt(jnp.maximum(under, 1e-10)) - o_dot_d
    p_sphere = ray_o + d_sphere[..., None] * ray_d
    p_mid = ray_o - o_dot_d[..., None] * ray_d
    p_mid_norm = safe_norm(p_mid)

    rot_axis = jnp.cross(ray_o, p_sphere)
    rot_axis = rot_axis / jnp.maximum(
        safe_norm(rot_axis, keepdims=True), 1e-12
    )
    phi = jnp.arcsin(jnp.clip(p_mid_norm / radius, -1.0, 1.0))
    theta = jnp.arcsin(jnp.clip(p_mid_norm * depth, -1.0, 1.0))
    ang = (phi - theta)[..., None]

    # Rodrigues rotation of p_sphere about rot_axis by ang
    p_new = (
        p_sphere * jnp.cos(ang)
        + jnp.cross(rot_axis, p_sphere) * jnp.sin(ang)
        + rot_axis * jnp.sum(rot_axis * p_sphere, -1, keepdims=True)
        * (1.0 - jnp.cos(ang))
    )
    p_new = p_new / jnp.maximum(safe_norm(p_new, keepdims=True), 1e-12)
    return jnp.concatenate([p_new, depth[..., None]], axis=-1)


def bg_volume_weights(z_vals_bg: jnp.ndarray, bg_density: jnp.ndarray):
    """Transmittance weights along the flipped (1 -> 0) inverse-depth axis
    (background.py:137-165)."""
    R = z_vals_bg.shape[0]
    dists = z_vals_bg[:, :-1] - z_vals_bg[:, 1:]
    dists = jnp.concatenate([dists, jnp.full((R, 1), 1e10)], axis=-1)
    free_energy = dists * bg_density
    shifted = jnp.concatenate(
        [jnp.zeros((R, 1)), free_energy[:, :-1]], axis=-1
    )
    alpha = 1.0 - jnp.exp(-free_energy)
    transmittance = jnp.exp(-jnp.cumsum(shifted, axis=-1))
    return alpha * transmittance


def background_forward(
    params: dict,
    plans: dict,
    bg_weights: jnp.ndarray,  # (R,) leftover fg transmittance
    ray_dirs: jnp.ndarray,  # (R, 3)
    cam_loc: jnp.ndarray,  # (R, 3)
    z_vals_bg: jnp.ndarray,  # (R, S) inverse-depth samples (ascending)
    frame_idx: jnp.ndarray,  # (R,) per-ray frame index
    radius: float,
    step=None,
) -> dict:
    R, S = z_vals_bg.shape
    from ..models.mlp import resolve_weight_norm
    from ..models.nodes import _shade_params

    params = dict(params)
    params["implicit"] = resolve_weight_norm(params["implicit"])
    params["rendering"] = resolve_weight_norm(params["rendering"])
    latent = params["frame_latent"][frame_idx]  # (R, D)
    imp_sh = _shade_params(params["implicit"])
    rend_sh = _shade_params(params["rendering"])

    z_flip = jnp.flip(z_vals_bg, axis=-1)  # 1 -> 0
    dirs = jnp.broadcast_to(ray_dirs[:, None, :], (R, S, 3))
    locs = jnp.broadcast_to(cam_loc[:, None, :], (R, S, 3))
    pts4 = depth2pts_outside(locs, dirs, z_flip, radius)  # (R, S, 4)

    latent_per_pt = jnp.broadcast_to(latent[:, None, :], (R, S, latent.shape[-1]))
    # whole bg net may run bf16: its "sdf" channel is a NeRF++ density (no
    # eikonal/second-order), so the f32-head constraint of the fg nodes does
    # not apply here
    out = apply_implicit_net(
        imp_sh, plans["implicit"],
        pts4.reshape(R * S, 4), latent_per_pt.reshape(R * S, -1), step=step,
    )
    bg_sdf = out[:, :1].astype(jnp.float32)
    bg_feat = out[:, 1:]
    rgb = apply_rendering_net(
        rend_sh, plans["rendering"],
        None, None,
        dirs.reshape(R * S, 3), None, bg_feat,
        frame_latent_code=latent_per_pt.reshape(R * S, -1),
        step=step,
    ).reshape(R, S, 3)

    w = bg_volume_weights(z_flip, abs_density(bg_sdf).reshape(R, S))
    bg_rgb_only = jnp.sum(w[..., None] * rgb, axis=1)
    bg_rgb = bg_weights[:, None] * bg_rgb_only

    bg_sem = jnp.zeros((R, MAX_CLASS)).at[:, 0].set(1.0)
    return {
        "bg_rgb": bg_rgb,
        "bg_rgb_only": bg_rgb_only,
        "bg_semantics": bg_weights[:, None] * bg_sem,
    }
