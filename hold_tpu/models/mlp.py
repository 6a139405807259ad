"""SDF and color MLPs as functional JAX modules (init fn + apply fn).

Architecture parity with the reference networks:
- ImplicitNet (code/src/networks/shape_net.py:8-144): 8x256 softplus(beta=100)
  MLP, skip connection at layer 4, SAL geometric initialisation, weight
  normalisation, conditioning (pose / frame latent) concatenated at layer 0,
  output = [sdf, 256-d feature].
- RenderingNet (code/src/networks/texture_net.py:7-101): 'pose' mode
  (points, normals, 8-d embedded body pose, features) and
  'nerf_frame_encoding' mode (embedded view dirs, frame latent, features),
  ReLU hidden layers + sigmoid output.

Parameters are plain nested dicts (pytrees); apply functions are pure and
batched over a flat point axis, so XLA can fuse them into the surrounding
render graph and tile the matmuls onto the MXU.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .embedders import embed_dim, make_embedder


def _linear_params(rng, fan_in: int, fan_out: int):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(max(fan_in, 1))
    return {
        "w": jax.random.uniform(k1, (fan_out, fan_in), minval=-bound, maxval=bound),
        "b": jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound),
    }


def _weight_normalize(layer: dict) -> dict:
    """Reparameterize w -> (v, g) with g = row norms (torch weight_norm dim=0)."""
    w = layer["w"]
    g = jnp.linalg.norm(w, axis=1, keepdims=True)
    return {"v": w, "g": g, "b": layer["b"]}


def _apply_linear(layer: dict, x: jnp.ndarray,
                  in_cols: int | None = None) -> jnp.ndarray:
    if "v" in layer:
        v, g = layer["v"], layer["g"]
        w = g * v / jnp.linalg.norm(v, axis=1, keepdims=True)
    else:
        w = layer["w"]
    if in_cols is not None:
        # caller guarantees inputs beyond in_cols are identically zero (the
        # CVPR-zeroed 45-d pose conditioning) — drop those columns instead of
        # materializing a per-point zeros block.  Must slice AFTER the
        # weight-norm resolve: g normalizes over the FULL row.
        w = w[:, :in_cols]
    # mixed-precision contract: bf16 params pull activations down to bf16 at
    # the layer boundary (embeddings/heads stay f32 at the call sites); f32
    # params leave dtypes untouched
    if w.dtype == jnp.bfloat16 and x.dtype != jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    return x @ w.T + layer["b"]


def resolve_weight_norm(net_params: dict) -> dict:
    """Materialize weight-normed layers to plain {'w','b'} ONCE.

    _apply_linear renormalizes (g, v) on every call; under chunked shading
    that recompute lands in every chunk of every forward/remat/backward pass
    — traced at hundreds of ~0.1 ms (256,256) reduce fusions per train step.
    Resolving before the chunk loop computes the normalization (and its
    gradient) once per step.  Gradients w.r.t. (g, v) are unchanged — the
    chain rule just runs through one resolve instead of N copies."""

    def conv(layer):
        if "v" in layer:
            v, g = layer["v"], layer["g"]
            return {"w": g * v / jnp.linalg.norm(v, axis=1, keepdims=True),
                    "b": layer["b"]}
        return layer

    out = dict(net_params)
    if "layers" in out:
        out["layers"] = [conv(l) for l in out["layers"]]
    if "lin_pose" in out:
        out["lin_pose"] = conv(out["lin_pose"])
    return out


def softplus100(x: jnp.ndarray) -> jnp.ndarray:
    """Softplus with beta=100, in the split max/log1p form.

    Mathematically identical to jax.nn.softplus(100*x)/100, but that graph's
    double-backward (needed for eikonal/normal terms) reliably SIGILLs the
    TPU compiler at depth >= ~6; this formulation compiles cleanly."""
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(100.0 * x))) / 100.0


# --------------------------------------------------------------------------
# ImplicitNet (canonical SDF field)
# --------------------------------------------------------------------------

def implicit_net_shapes(opt, specs) -> dict[str, Any]:
    """Static layer plan shared by init and apply."""
    d_out = opt["d_out"] + opt["feature_vector_size"]
    dims = [opt["d_in"]] + list(opt["dims"]) + [d_out]
    multires = opt["multires"]
    if multires > 0:
        dims[0] = embed_dim(opt["d_in"], multires)
    cond = opt["cond"]
    if cond == "pose":
        cond_dim = specs["pose_dim"]
    elif cond == "frame":
        cond_dim = opt["dim_frame_encoding"]
    else:
        cond_dim = 0
    return {
        "dims": dims,
        "raw_in": opt["d_in"],
        "skip_in": tuple(opt["skip_in"]),
        "cond": cond,
        "cond_dim": cond_dim,
        "multires": multires,
        "embedding": specs["embedding"],
        "weight_norm": bool(opt.get("weight_norm", True)),
        "init": opt.get("init", "geometry"),
        "bias": float(opt.get("bias", 0.6)),
        "num_layers": len(dims),
    }


def init_implicit_net(rng, opt, specs, barf_s: int = 0, barf_e: int = 1) -> dict:
    plan = implicit_net_shapes(opt, specs)
    dims, skip_in = plan["dims"], plan["skip_in"]
    layers = []
    for l in range(plan["num_layers"] - 1):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in skip_in else dims[l + 1]
        in_dim = dims[l] + (plan["cond_dim"] if l == 0 and plan["cond"] != "none" else 0)
        rng, sub = jax.random.split(rng)
        p = _linear_params(sub, in_dim, out_dim)
        if plan["init"] == "geometry":
            # SAL geometric initialisation (shape_net.py:51-73): biases the
            # field toward a sphere of radius `bias` at init.
            if l == plan["num_layers"] - 2:
                rng, sub = jax.random.split(rng)
                p["w"] = (
                    np.sqrt(np.pi) / np.sqrt(dims[l])
                    + 1e-4 * jax.random.normal(sub, p["w"].shape)
                )
                p["b"] = jnp.full_like(p["b"], -plan["bias"])
            elif plan["multires"] > 0 and l == 0:
                rng, sub = jax.random.split(rng)
                w = jnp.zeros_like(p["w"])
                w = w.at[:, :3].set(
                    jax.random.normal(sub, (out_dim, 3)) * np.sqrt(2) / np.sqrt(out_dim)
                )
                p["w"] = w
                p["b"] = jnp.zeros_like(p["b"])
            elif plan["multires"] > 0 and l in skip_in:
                rng, sub = jax.random.split(rng)
                w = jax.random.normal(sub, p["w"].shape) * np.sqrt(2) / np.sqrt(out_dim)
                w = w.at[:, -(dims[0] - 3):].set(0.0)
                p["w"] = w
                p["b"] = jnp.zeros_like(p["b"])
            else:
                rng, sub = jax.random.split(rng)
                p["w"] = jax.random.normal(sub, p["w"].shape) * np.sqrt(2) / np.sqrt(out_dim)
                p["b"] = jnp.zeros_like(p["b"])
        elif plan["init"] == "zero":
            if l == plan["num_layers"] - 2:
                rng, sub = jax.random.split(rng)
                p["w"] = jax.random.uniform(sub, p["w"].shape, minval=-1e-5, maxval=1e-5)
                p["b"] = jnp.zeros_like(p["b"])
        if plan["weight_norm"]:
            p = _weight_normalize(p)
        layers.append(p)
    return {"layers": layers}


def apply_implicit_trunk(
    params: dict,
    plan: dict,
    x: jnp.ndarray,
    cond: jnp.ndarray | None,
    step=None,
    barf_cfg: tuple[int, int] = (0, 1),
) -> jnp.ndarray:
    """All layers up to (and including) the last hidden activation: (N, W)."""
    if plan["multires"] > 0:
        embed = make_embedder(plan["embedding"], plan["multires"], *barf_cfg)
        x = embed(x, step)
    inp = x
    # CVPR behaviour: the 45-d MANO pose conditioning is always zeroed
    # (shape_net.py:104-106).  Rather than materialize a per-point zeros
    # block and concatenate it, skip the concat and drop the matching
    # layer-0 weight columns — mathematically identical (W @ [e; 0]).
    zero_cond = plan["cond"] != "none" and plan["cond_dim"] == 45
    h = x
    for l in range(plan["num_layers"] - 2):
        cols = None
        if plan["cond"] != "none" and l == 0 and plan["cond_dim"] > 0:
            if zero_cond:
                cols = h.shape[-1]
            else:
                h = jnp.concatenate([h, cond.astype(h.dtype)], axis=-1)
        if l in plan["skip_in"]:
            # python-float divisor: a np scalar would promote bf16 -> f32
            h = jnp.concatenate(
                [h, inp.astype(h.dtype)], axis=-1
            ) / float(np.sqrt(2))
        h = _apply_linear(params["layers"][l], h, in_cols=cols)
        h = softplus100(h)
    return h


def _last_layer_weight(params: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    layer = params["layers"][-1]
    if "v" in layer:
        v, g = layer["v"], layer["g"]
        w = g * v / jnp.linalg.norm(v, axis=1, keepdims=True)
    else:
        w = layer["w"]
    return w, layer["b"]


def implicit_sdf_from_trunk(params: dict, h: jnp.ndarray) -> jnp.ndarray:
    """Scalar SDF head (row 0 of the output layer): (N,), always f32.

    Kept width-1 on purpose: the double-backward (eikonal / normals) only
    traverses this head — the TPU compiler SIGILLs on second-order graphs
    through wide output matmuls, but a width-1 head is safe.  The head runs
    f32 even under bf16 shading: the sdf feeds the Laplace density whose
    beta anneals to ~1e-3."""
    w, b = _last_layer_weight(params)
    return h.astype(jnp.float32) @ w[0].astype(jnp.float32) + b[0].astype(
        jnp.float32
    )


def implicit_feat_from_trunk(params: dict, h: jnp.ndarray) -> jnp.ndarray:
    """Feature head (rows 1:): (N, F). First-order only."""
    w, b = _last_layer_weight(params)
    return h @ w[1:].T + b[1:]


def apply_implicit_net(
    params: dict,
    plan: dict,
    x: jnp.ndarray,  # (N, d_in) canonical points
    cond: jnp.ndarray | None,  # (N, cond_dim) already broadcast per point
    step=None,  # traced global step (BARF) or None (eval / fourier)
    barf_cfg: tuple[int, int] = (0, 1),
) -> jnp.ndarray:
    """Returns (N, 1 + feature_size): [sdf, features]."""
    raw = x
    if plan["multires"] > 0:
        embed = make_embedder(plan["embedding"], plan["multires"], *barf_cfg)
        x = embed(x, step)
    inp = x
    # see apply_implicit_trunk: zeroed 45-d conditioning handled by dropping
    # the matching layer-0 weight columns
    zero_cond = plan["cond"] != "none" and plan["cond_dim"] == 45

    h = x
    for l in range(plan["num_layers"] - 1):
        cols = None
        if plan["cond"] != "none" and l == 0 and plan["cond_dim"] > 0:
            if zero_cond:
                cols = h.shape[-1]
            else:
                h = jnp.concatenate([h, cond.astype(h.dtype)], axis=-1)
        if l in plan["skip_in"]:
            h = jnp.concatenate(
                [h, inp.astype(h.dtype)], axis=-1
            ) / float(np.sqrt(2))
        h = _apply_linear(params["layers"][l], h, in_cols=cols)
        if l < plan["num_layers"] - 2:
            h = softplus100(h)
    return h


# --------------------------------------------------------------------------
# Proposal net (sampler FLOP diet — no reference counterpart)
# --------------------------------------------------------------------------
#
# A small canonical-SDF surrogate distilled ONLINE from the trunk: the
# error-bound sampler only *ranks and places* z samples (stop-gradient by
# contract, reference ray_sampler.py:169-177 runs its queries under
# no_grad), so its table-building queries don't need the full 8x256 trunk.
# The proposal regresses the trunk's sdf at the shade-stage sample points
# (models/losses.py loss/proposal) and replaces the trunk in the sampler's
# query loop after a warmup — cutting sampler query FLOPs ~40x while the
# final 98-sample shade pass stays exact.  Accuracy is A/B-gated
# (docs/performance.md).

def proposal_net_shapes(opt: dict) -> dict:
    width = int(opt.get("width", 64))
    depth = int(opt.get("depth", 3))
    multires = int(opt.get("multires", 6))
    return {
        "dims": [embed_dim(3, multires)] + [width] * depth + [1],
        "multires": multires,
    }


def init_proposal_net(rng, opt: dict) -> dict:
    plan = proposal_net_shapes(opt)
    dims = plan["dims"]
    layers = []
    for l in range(len(dims) - 1):
        rng, sub = jax.random.split(rng)
        layers.append(_linear_params(sub, dims[l], dims[l + 1]))
    return {"layers": layers}


def apply_proposal_net(
    params: dict,
    plan: dict,
    x: jnp.ndarray,  # (N, 3) canonical points
    step=None,
    barf_cfg: tuple[int, int] = (0, 1),
    embedding: str = "barf",
) -> jnp.ndarray:
    """(N,) surrogate sdf.  Uses the SAME (annealed) positional embedding as
    the trunk so the distillation target is representable at every step."""
    embed = make_embedder(embedding, plan["multires"], *barf_cfg)
    h = embed(x, step)
    n = len(params["layers"])
    for l, layer in enumerate(params["layers"]):
        h = _apply_linear(layer, h)
        if l < n - 1:
            h = softplus100(h)
    return h[..., 0].astype(jnp.float32)


# --------------------------------------------------------------------------
# RenderingNet (color field)
# --------------------------------------------------------------------------

def rendering_net_shapes(opt, specs) -> dict[str, Any]:
    dims = [opt["d_in"] + opt["feature_vector_size"]] + list(opt["dims"]) + [opt["d_out"]]
    mode = opt["mode"]
    multires_view = opt.get("multires_view", -1)
    if multires_view > 0:
        dims[0] += embed_dim(3, multires_view) - 3
    if mode == "nerf_frame_encoding":
        dims[0] += opt["dim_frame_encoding"]
    plan = {
        "dims": dims,
        "mode": mode,
        "multires_view": multires_view,
        "embedding": specs["embedding"],
        "weight_norm": bool(opt.get("weight_norm", True)),
        "num_layers": len(dims),
        "pose_dim": specs.get("pose_dim", 0),
        "dim_cond_embed": 8,
    }
    return plan


def init_rendering_net(rng, opt, specs) -> dict:
    plan = rendering_net_shapes(opt, specs)
    layers = []
    for l in range(plan["num_layers"] - 1):
        rng, sub = jax.random.split(rng)
        p = _linear_params(sub, plan["dims"][l], plan["dims"][l + 1])
        if plan["weight_norm"]:
            p = _weight_normalize(p)
        layers.append(p)
    out = {"layers": layers}
    if plan["mode"] == "pose" and plan["pose_dim"] > 0:
        rng, sub = jax.random.split(rng)
        out["lin_pose"] = _linear_params(sub, plan["pose_dim"], plan["dim_cond_embed"])
    return out


def apply_rendering_net(
    params: dict,
    plan: dict,
    points: jnp.ndarray | None,  # (N, 3) canonical points ('pose' mode)
    normals: jnp.ndarray | None,  # (N, 3)
    view_dirs: jnp.ndarray | None,  # (N, 3)
    body_pose: jnp.ndarray | None,  # (N, pose_dim) broadcast per point
    feature_vectors: jnp.ndarray,  # (N, F) (+time code appended by caller)
    frame_latent_code: jnp.ndarray | None = None,  # (N, dim_frame)
    step=None,
    barf_cfg: tuple[int, int] = (0, 1),
    pose_embed: jnp.ndarray | None = None,  # (N, 8) precomputed lin_pose out
) -> jnp.ndarray:
    if plan["mode"] == "nerf_frame_encoding":
        if plan["multires_view"] > 0:
            embed = make_embedder(plan["embedding"], plan["multires_view"], *barf_cfg)
            view_dirs = embed(view_dirs, step)
        h = jnp.concatenate([view_dirs, frame_latent_code, feature_vectors], axis=-1)
    elif plan["mode"] == "pose":
        if pose_embed is not None:
            pass  # caller applied lin_pose once per FRAME, not per point
        elif plan["pose_dim"] > 0:
            pose_embed = _apply_linear(params["lin_pose"], body_pose)
        else:
            pose_embed = jnp.zeros(points.shape[:-1] + (plan["dim_cond_embed"],))
        h = jnp.concatenate(
            [points, normals.astype(points.dtype),
             pose_embed.astype(points.dtype),
             feature_vectors.astype(points.dtype)],
            axis=-1,
        )
    else:
        raise NotImplementedError(plan["mode"])

    for l in range(plan["num_layers"] - 1):
        h = _apply_linear(params["layers"][l], h)
        if l < plan["num_layers"] - 2:
            h = jax.nn.relu(h)
    # sigmoid in f32: bf16 saturates early and the rgb loss is L1-tight
    return jax.nn.sigmoid(h.astype(jnp.float32))
