"""Fused sampler SDF query: warp + positional embedding + SDF trunk in VMEM.

The VolSDF error-bound sampler evaluates the canonical SDF at every refinement
round (code/src/engine/ray_sampler.py:161-311) under no_grad.  As separate XLA
ops this streams every intermediate — warped points, the (N, 39) embedding and
eight (N, 256) trunk activations — through HBM (~230 ms/step at 10k rays,
traced in round 3).  Since the sampler path is stop-gradient by contract,
the whole query chain can run as ONE Pallas kernel with the MLP weights
resident in VMEM:

    points tile (T=512)
      -> deformed->canonical warp        (hand: fused KNN+blend+affine-inverse
                                          as in ops/knn.py; object: rigid)
      -> Fourier/BARF embedding          (built by a tiny spread matmul +
                                          masked sin/cos, lanes-major)
      -> 8x256 softplus100 trunk         (bf16 MXU matmuls, f32 accumulate,
                                          skip concat expressed as a split
                                          matmul: h@W4h + emb@W4e)
      -> width-1 f32 SDF head

Everything stays lanes-major (C, T): activations flow as (256, T) tiles so no
in-kernel transposes are needed, and HBM traffic per query point drops from
~2.5 KB to ~36 B (padded points in, one f32 out).

Supported trunk pattern (asserted): d_in=3, multires>0, 8 hidden layers of
width 256, skip at layer 4, conditioning dropped (CVPR-zeroed 45-d pose /
empty object cond).  Anything else falls back to the XLA path in
models/nodes.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn import _CLAMP, _inv3_planes, _round_up, _xyz_rows, kth_smallest

_T = 512  # points per tile
_EMB_ROWS = 48  # embedding rows (39 used for multires=6), sublane-padded


# --------------------------------------------------------------------------
# Host/XLA-side packing
# --------------------------------------------------------------------------

def supports_fused_query(plan: dict) -> bool:
    """True when the implicit-net plan matches the kernel's static pattern."""
    dims = plan["dims"]
    return (
        plan["raw_in"] == 3
        and plan["multires"] > 0
        and 3 * (2 * plan["multires"] + 1) <= _EMB_ROWS
        and plan["skip_in"] == (4,)
        and len(dims) == 10
        and all(d == 256 for d in dims[1:9])
        and dims[9] >= 1
        and (plan["cond"] == "none" or plan["cond_dim"] in (0, 45))
    )


def pack_trunk_weights(resolved: dict, plan: dict) -> dict:
    """Resolved {'w','b'} layers -> kernel operand dict (bf16 weights).

    Weight matrices keep their native (out, in) orientation — exactly what the
    lanes-major matmul h_out = W @ h_in consumes.  The skip layer's concat
    ([h, emb]/sqrt(2) @ W4^T) is re-expressed as h @ (W4h/sqrt2)^T +
    emb @ (W4e/sqrt2)^T by splitting W4's input columns.
    """
    assert supports_fused_query(plan), "unsupported trunk plan"
    layers = resolved["layers"]
    E = 3 * (2 * plan["multires"] + 1)  # 39
    s2 = float(np.sqrt(2.0))

    def bf(x):
        return jnp.asarray(x, jnp.bfloat16)

    w0 = jnp.zeros((256, _EMB_ROWS), jnp.float32).at[:, :E].set(
        layers[0]["w"][:, :E]  # cond columns (if any) are zero-multiplied
    )
    w4 = layers[4]["w"]
    w4e = jnp.zeros((256, _EMB_ROWS), jnp.float32).at[:, :E].set(
        w4[:, 217 : 217 + E] / s2
    )
    bias = jnp.zeros((256, 8), jnp.float32)
    for l in range(8):
        b = layers[l]["b"]
        bias = bias.at[: b.shape[0], l].set(b)
    # layer 3 emits 217 rows; pad to a 16-sublane multiple (224) for bf16
    # tiling.  The pad rows produce softplus(0) != 0 downstream, so the
    # matching W4h columns are zero — the garbage never propagates.
    w3 = jnp.zeros((224, 256), jnp.float32).at[:217].set(layers[3]["w"])
    w4h = jnp.zeros((256, 224), jnp.float32).at[:, :217].set(
        w4[:, :217] / s2
    )
    return {
        "W0": bf(w0),
        "W1": bf(layers[1]["w"]),
        "W2": bf(layers[2]["w"]),
        "W3": bf(w3),  # (224, 256), rows 217+ zero
        "W4h": bf(w4h),  # (256, 224), cols 217+ zero
        "W4e": bf(w4e),
        "W5": bf(layers[5]["w"]),
        "W6": bf(layers[6]["w"]),
        "W7": bf(layers[7]["w"]),
        "bias": bias,
        "head_w": jnp.asarray(layers[8]["w"][0:1, :], jnp.float32),  # (1,256)
        "head_b": jnp.asarray(
            layers[8]["b"][0], jnp.float32
        ).reshape(1, 1),
    }


def embed_plan(multires: int, window: jnp.ndarray | None) -> jnp.ndarray:
    """(EMB_ROWS, 8) plan: cols 0-2 = x/sin/cos masks, col 3 = BARF window
    (ones when None), cols 4-6 = frequency spread matrix rows.

    Row layout matches embedders.fourier_embed: [x (3) | per freq k:
    sin(2^k x) (3), cos(2^k x) (3)]."""
    E = 3 * (2 * multires + 1)
    plan = np.zeros((_EMB_ROWS, 8), np.float32)
    for d in range(3):
        plan[d, 0] = 1.0  # x mask
        plan[d, 4 + d] = 1.0  # spread: identity
    for k in range(multires):
        f = float(2.0**k)
        for d in range(3):
            rs = 3 + 6 * k + d
            rc = 3 + 6 * k + 3 + d
            plan[rs, 1] = 1.0  # sin mask
            plan[rc, 2] = 1.0  # cos mask
            plan[rs, 4 + d] = f
            plan[rc, 4 + d] = f
    out = jnp.asarray(plan)
    if window is None:
        win = jnp.ones((_EMB_ROWS,), jnp.float32).at[E:].set(0.0)
    else:
        win = jnp.zeros((_EMB_ROWS,), jnp.float32).at[:E].set(
            window.astype(jnp.float32)
        )
    return out.at[:, 3].set(win)


# --------------------------------------------------------------------------
# Kernel body pieces
# --------------------------------------------------------------------------

def _softplus100(x):
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(100.0 * x))) / 100.0


def _emb_mlp_head(xc3, plan_ref, w0_ref, w1_ref, w2_ref, w3_ref, w4h_ref,
                  w4e_ref, w5_ref, w6_ref, w7_ref, b_ref, hw_ref, hb_ref,
                  relu=False):
    """xc3: (3, T) canonical points, lanes-major. Returns sdf (1, T) f32.

    relu=True swaps the trunk activation softplus(beta=100) -> relu for the
    HIDDEN layers only (the final pre-head activation stays exact): the two
    differ by at most log(2)/100 = 0.0069 per activation, the same order as
    the bf16 rounding the trunk already accepts, and the sampler output only
    *ranks and places* z samples.  Cuts the per-tile transcendental budget
    (exp+log1p over (256, T) x 8 layers) to zero.  Gated by
    HOLD_SAMPLER_RELU (default off) until an on-chip eval-parity run."""
    plan = plan_ref[:]  # (EMB_ROWS, 8)
    spread = plan[:, 4:7]  # (EMB_ROWS, 3)
    arg = jax.lax.dot_general(
        spread, xc3, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (EMB_ROWS, T)
    emb = (
        plan[:, 0:1] * arg
        + plan[:, 1:2] * jnp.sin(arg)
        + plan[:, 2:3] * jnp.cos(arg)
    ) * plan[:, 3:4]
    emb16 = emb.astype(jnp.bfloat16)

    def lin(w_ref, h, l):
        out = jax.lax.dot_general(
            w_ref[:], h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out + b_ref[: out.shape[0], l : l + 1]

    act = (lambda x: jnp.maximum(x, 0.0)) if relu else _softplus100
    h = act(lin(w0_ref, emb16, 0)).astype(jnp.bfloat16)
    h = act(lin(w1_ref, h, 1)).astype(jnp.bfloat16)
    h = act(lin(w2_ref, h, 2)).astype(jnp.bfloat16)
    h = act(lin(w3_ref, h, 3)).astype(jnp.bfloat16)  # (224, T)
    h4 = lin(w4h_ref, h, 4) + jax.lax.dot_general(
        w4e_ref[:], emb16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = act(h4).astype(jnp.bfloat16)
    h = act(lin(w5_ref, h, 5)).astype(jnp.bfloat16)
    h = act(lin(w6_ref, h, 6)).astype(jnp.bfloat16)
    h = _softplus100(lin(w7_ref, h, 7))  # f32 for the head
    sdf = jax.lax.dot_general(
        hw_ref[:], h, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + hb_ref[0, 0]
    return sdf  # (1, T)


def _points_from_rays_z(rays, z):
    """Expand (cam, dir, z) to world points, lanes-major, in-kernel.

    rays: (RT, 8) rows [dir xyz | cam xyz | pad]; z: (RT, S) depth table.
    Returns ((3, RT*S) xyz rows, (1, RT*S) squared norms).  Replaces the
    XLA-side `cam + z*dir` materialisation + (B, N, 8) pad that cost ~30 ms
    of pure HBM traffic per step at 10k rays (trace: `pad` 21.7 ms + `copy`
    9.8 ms in the sampler module)."""
    RT, S = z.shape
    segs = []
    for r in range(RT):  # static unroll; RT = tile_points / S (e.g. 4)
        zr = z[r : r + 1]  # (1, S)
        seg = jnp.concatenate(
            [rays[r, 3 + m] + rays[r, m] * zr for m in range(3)], axis=0
        )  # (3, S)
        segs.append(seg)
    xyz = jnp.concatenate(segs, axis=1)  # (3, T)
    psq = xyz[0:1] * xyz[0:1] + xyz[1:2] * xyz[1:2] + xyz[2:3] * xyz[2:3]
    return xyz, psq


def _knn_warp_rows(pts, verts, vsq, w, tf, K):
    """Shared math with ops/knn._knn_warp_kernel: returns xc as 3 (1, T) rows."""
    xyz, psq = _xyz_rows(pts)
    return _knn_warp_from_xyz(xyz, psq, verts, vsq, w, tf, K)


def _knn_warp_from_xyz(xyz, psq, verts, vsq, w, tf, K):
    """KNN warp over lanes-major points: xyz (3, T), psq (1, T)."""
    cross = jax.lax.dot_general(
        verts[:, :3], xyz, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d2 = jnp.maximum(vsq + psq - 2.0 * cross, 0.0)
    d2c = jnp.minimum(d2, _CLAMP)
    kth = kth_smallest(d2, K, axis=0)
    conf = jnp.where(d2 <= kth, jnp.exp(-d2c), 0.0)
    conf = conf / jnp.sum(conf, axis=0, keepdims=True)
    wb = jax.lax.dot_general(
        w, conf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    A = jax.lax.dot_general(
        tf, wb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16, T)
    r = [A[4 * i + m : 4 * i + m + 1] for i in range(3) for m in range(3)]
    t = [A[4 * i + 3 : 4 * i + 4] for i in range(3)]
    inv = _inv3_planes(r)
    diff = [xyz[m : m + 1] - t[m] for m in range(3)]
    return [
        sum(inv[3 * i + m] * diff[m] for m in range(3)) for i in range(3)
    ]


def _hand_query_kernel(pts_ref, verts_ref, vsq_ref, w_ref, tf_ref, plan_ref,
                       w0, w1, w2, w3, w4h, w4e, w5, w6, w7, b, hw, hb,
                       out_ref, *, K, relu=False):
    xc = _knn_warp_rows(pts_ref[0], verts_ref[0], vsq_ref[0], w_ref[0],
                        tf_ref[0], K)
    xc3 = jnp.concatenate(xc, axis=0)  # (3, T)
    sdf = _emb_mlp_head(xc3, plan_ref, w0, w1, w2, w3, w4h, w4e, w5, w6, w7,
                        b, hw, hb, relu=relu)
    pad = jnp.zeros((7, sdf.shape[1]), jnp.float32)
    out_ref[0] = jnp.concatenate([sdf, pad], axis=0)


def _object_query_kernel(pts_ref, tfi_ref, plan_ref,
                         w0, w1, w2, w3, w4h, w4e, w5, w6, w7, b, hw, hb,
                         out_ref, *, relu=False):
    pts = pts_ref[0]
    xyz, _ = _xyz_rows(pts)
    tfi = tfi_ref[0]  # (16, 8): col 0 = [Rinv row-major (9), t (3), ...]
    diff = [xyz[m : m + 1] - tfi[9 + m : 10 + m, 0:1] for m in range(3)]
    xc = [
        sum(tfi[3 * i + m : 3 * i + m + 1, 0:1] * diff[m] for m in range(3))
        for i in range(3)
    ]
    xc3 = jnp.concatenate(xc, axis=0)
    sdf = _emb_mlp_head(xc3, plan_ref, w0, w1, w2, w3, w4h, w4e, w5, w6, w7,
                        b, hw, hb, relu=relu)
    pad = jnp.zeros((7, sdf.shape[1]), jnp.float32)
    out_ref[0] = jnp.concatenate([sdf, pad], axis=0)


def _hand_query_z_kernel(rays_ref, z_ref, verts_ref, vsq_ref, w_ref, tf_ref,
                         plan_ref, w0, w1, w2, w3, w4h, w4e, w5, w6, w7, b,
                         hw, hb, out_ref, *, K, relu=False):
    # tile = 8 rays x S samples (TPU block constraint: second-minor dims must
    # be 8-divisible); the warp+MLP runs over _T-point slices so the KNN
    # distance buffers stay at the proven VMEM footprint
    xyz_full, psq_full = _points_from_rays_z(rays_ref[0], z_ref[0])
    for c in range(xyz_full.shape[1] // _T):
        sl = slice(c * _T, (c + 1) * _T)
        xc = _knn_warp_from_xyz(
            xyz_full[:, sl], psq_full[:, sl], verts_ref[0], vsq_ref[0],
            w_ref[0], tf_ref[0], K,
        )
        xc3 = jnp.concatenate(xc, axis=0)  # (3, _T)
        sdf = _emb_mlp_head(xc3, plan_ref, w0, w1, w2, w3, w4h, w4e, w5, w6,
                            w7, b, hw, hb, relu=relu)
        pad = jnp.zeros((7, sdf.shape[1]), jnp.float32)
        out_ref[0, :, sl] = jnp.concatenate([sdf, pad], axis=0)


def _object_query_z_kernel(rays_ref, z_ref, tfi_ref, plan_ref,
                           w0, w1, w2, w3, w4h, w4e, w5, w6, w7, b, hw, hb,
                           out_ref, *, relu=False):
    xyz_full, _ = _points_from_rays_z(rays_ref[0], z_ref[0])
    tfi = tfi_ref[0]  # (16, 8): col 0 = [Rinv row-major (9), t (3), ...]
    for c in range(xyz_full.shape[1] // _T):
        sl = slice(c * _T, (c + 1) * _T)
        xyz = xyz_full[:, sl]
        diff = [xyz[m : m + 1] - tfi[9 + m : 10 + m, 0:1] for m in range(3)]
        xc = [
            sum(tfi[3 * i + m : 3 * i + m + 1, 0:1] * diff[m]
                for m in range(3))
            for i in range(3)
        ]
        xc3 = jnp.concatenate(xc, axis=0)
        sdf = _emb_mlp_head(xc3, plan_ref, w0, w1, w2, w3, w4h, w4e, w5, w6,
                            w7, b, hw, hb, relu=relu)
        pad = jnp.zeros((7, sdf.shape[1]), jnp.float32)
        out_ref[0, :, sl] = jnp.concatenate([sdf, pad], axis=0)


# --------------------------------------------------------------------------
# pallas_call wrappers
# --------------------------------------------------------------------------

def _mlp_specs():
    full = lambda i, j: (0, 0)  # noqa: E731 — weights resident across grid
    V = pltpu.VMEM
    return [
        pl.BlockSpec((_EMB_ROWS, 8), full, memory_space=V),  # plan
        pl.BlockSpec((256, _EMB_ROWS), full, memory_space=V),  # W0
        pl.BlockSpec((256, 256), full, memory_space=V),
        pl.BlockSpec((256, 256), full, memory_space=V),
        pl.BlockSpec((224, 256), full, memory_space=V),
        pl.BlockSpec((256, 224), full, memory_space=V),
        pl.BlockSpec((256, _EMB_ROWS), full, memory_space=V),
        pl.BlockSpec((256, 256), full, memory_space=V),
        pl.BlockSpec((256, 256), full, memory_space=V),
        pl.BlockSpec((256, 256), full, memory_space=V),
        pl.BlockSpec((256, 8), full, memory_space=V),  # bias pack
        pl.BlockSpec((1, 256), full, memory_space=V),  # head w
        pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),  # head b
    ]


def _mlp_args(pack):
    return (
        pack["W0"], pack["W1"], pack["W2"], pack["W3"], pack["W4h"],
        pack["W4e"], pack["W5"], pack["W6"], pack["W7"], pack["bias"],
        pack["head_w"], pack["head_b"],
    )


@functools.partial(jax.jit, static_argnames=("K", "interpret", "relu"))
def fused_hand_sampler_sdf(pts, verts, skin_weights, tfs, plan_arr, pack,
                           K: int = 15, interpret: bool = False,
                           relu: bool = False):
    """(B,N,3),(B,V,3),(B,V,J),(B,J,4,4) + packed trunk -> sdf (B, N) f32."""
    B, N = pts.shape[:2]
    V, J = verts.shape[1], skin_weights.shape[2]
    Np = _round_up(N, _T)
    Vp = _round_up(V, 128)
    Jp = _round_up(J, 8)

    pts_pad = jnp.zeros((B, Np, 8), jnp.float32).at[:, :N, :3].set(pts)
    verts_pad = jnp.zeros((B, Vp, 8), jnp.float32).at[:, :V, :3].set(verts)
    vsq = jnp.full((B, Vp, 1), 1e9, jnp.float32).at[:, :V, 0].set(
        jnp.sum(verts * verts, axis=-1)
    )
    w_pad = jnp.zeros((B, Vp, Jp), jnp.float32).at[:, :V, :J].set(skin_weights)
    tf16 = jnp.zeros((B, 16, Jp), jnp.float32).at[:, :, :J].set(
        jnp.swapaxes(tfs.reshape(B, J, 16), 1, 2)
    )

    V_ = pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_hand_query_kernel, K=K, relu=relu),
        grid=(B, Np // _T),
        in_specs=[
            pl.BlockSpec((1, _T, 8), lambda b, t: (b, t, 0), memory_space=V_),
            pl.BlockSpec((1, Vp, 8), lambda b, t: (b, 0, 0), memory_space=V_),
            pl.BlockSpec((1, Vp, 1), lambda b, t: (b, 0, 0), memory_space=V_),
            pl.BlockSpec((1, Vp, Jp), lambda b, t: (b, 0, 0), memory_space=V_),
            pl.BlockSpec((1, 16, Jp), lambda b, t: (b, 0, 0), memory_space=V_),
        ] + _mlp_specs(),
        out_specs=pl.BlockSpec(
            (1, 8, _T), lambda b, t: (b, 0, t), memory_space=V_
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, Np), jnp.float32),
        interpret=interpret,
    )(pts_pad, verts_pad, vsq, w_pad, tf16, plan_arr, *_mlp_args(pack))
    return out[:, 0, :N]


@functools.partial(jax.jit, static_argnames=("interpret", "relu"))
def fused_object_sampler_sdf(pts, tf_inv12, plan_arr, pack,
                             interpret: bool = False, relu: bool = False):
    """(B,N,3) + per-frame inverse affine (B,12: Rinv row-major 9 | t 3) ->
    sdf (B, N) f32."""
    B, N = pts.shape[:2]
    Np = _round_up(N, _T)
    pts_pad = jnp.zeros((B, Np, 8), jnp.float32).at[:, :N, :3].set(pts)
    tfi = jnp.zeros((B, 16, 8), jnp.float32).at[:, :12, 0].set(tf_inv12)

    V_ = pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_object_query_kernel, relu=relu),
        grid=(B, Np // _T),
        in_specs=[
            pl.BlockSpec((1, _T, 8), lambda b, t: (b, t, 0), memory_space=V_),
            pl.BlockSpec((1, 16, 8), lambda b, t: (b, 0, 0), memory_space=V_),
        ] + _mlp_specs(),
        out_specs=pl.BlockSpec(
            (1, 8, _T), lambda b, t: (b, 0, t), memory_space=V_
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, Np), jnp.float32),
        interpret=interpret,
    )(pts_pad, tfi, plan_arr, *_mlp_args(pack))
    return out[:, 0, :N]


# --------------------------------------------------------------------------
# z-table entry points: points expanded in-kernel (sampler hot path)
# --------------------------------------------------------------------------

_RT = 8  # rays per z-kernel tile (TPU block: second-minor dim 8-divisible)


def pack_rays8(ray_dirs, cam_loc, B: int, P: int, S: int):
    """(R, 3) dirs + (R, 3) origins -> (B, Pp, 8) [dir | cam | pad] rows.

    Built ONCE per step and reused by every refinement round's query."""
    Pp = _round_up(P, _RT)
    rays = jnp.zeros((B, Pp, 8), jnp.float32)
    rays = rays.at[:, :P, :3].set(ray_dirs.reshape(B, P, 3))
    rays = rays.at[:, :P, 3:6].set(cam_loc.reshape(B, P, 3))
    return rays


@functools.partial(jax.jit, static_argnames=("K", "interpret", "relu"))
def fused_hand_sampler_sdf_z(rays8, z, verts, skin_weights, tfs, plan_arr,
                             pack, K: int = 15, interpret: bool = False,
                             relu: bool = False):
    """rays8 (B, Pp, 8) from pack_rays8; z (B, P, S) -> sdf (B, P, S) f32.

    Same math as fused_hand_sampler_sdf, but the world points cam + z*dir
    are expanded inside the kernel — input traffic per query drops from a
    padded (B, N, 8) point buffer (~42 MB/round at 10k rays) to the (B, P, S)
    z table (~5 MB) plus the shared ray rows."""
    B, P, S = z.shape
    RT = _RT
    assert (RT * S) % _T == 0, S  # tile splits into whole _T-point slices
    Pp = rays8.shape[1]
    z_pad = (
        z if Pp == P
        else jnp.zeros((B, Pp, S), jnp.float32).at[:, :P].set(z)
    )
    V, J = verts.shape[1], skin_weights.shape[2]
    Vp = _round_up(V, 128)
    Jp = _round_up(J, 8)
    verts_pad = jnp.zeros((B, Vp, 8), jnp.float32).at[:, :V, :3].set(verts)
    vsq = jnp.full((B, Vp, 1), 1e9, jnp.float32).at[:, :V, 0].set(
        jnp.sum(verts * verts, axis=-1)
    )
    w_pad = jnp.zeros((B, Vp, Jp), jnp.float32).at[:, :V, :J].set(skin_weights)
    tf16 = jnp.zeros((B, 16, Jp), jnp.float32).at[:, :, :J].set(
        jnp.swapaxes(tfs.reshape(B, J, 16), 1, 2)
    )

    V_ = pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_hand_query_z_kernel, K=K, relu=relu),
        grid=(B, Pp // RT),
        in_specs=[
            pl.BlockSpec((1, RT, 8), lambda b, t: (b, t, 0), memory_space=V_),
            pl.BlockSpec((1, RT, S), lambda b, t: (b, t, 0), memory_space=V_),
            pl.BlockSpec((1, Vp, 8), lambda b, t: (b, 0, 0), memory_space=V_),
            pl.BlockSpec((1, Vp, 1), lambda b, t: (b, 0, 0), memory_space=V_),
            pl.BlockSpec((1, Vp, Jp), lambda b, t: (b, 0, 0), memory_space=V_),
            pl.BlockSpec((1, 16, Jp), lambda b, t: (b, 0, 0), memory_space=V_),
        ] + _mlp_specs(),
        out_specs=pl.BlockSpec(
            (1, 8, RT * S), lambda b, t: (b, 0, t), memory_space=V_
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, Pp * S), jnp.float32),
        interpret=interpret,
    )(rays8, z_pad, verts_pad, vsq, w_pad, tf16, plan_arr, *_mlp_args(pack))
    return out[:, 0, : P * S].reshape(B, P, S)


@functools.partial(jax.jit, static_argnames=("interpret", "relu"))
def fused_object_sampler_sdf_z(rays8, z, tf_inv12, plan_arr, pack,
                               interpret: bool = False, relu: bool = False):
    """rays8 (B, Pp, 8); z (B, P, S); per-frame inverse affine (B, 12) ->
    sdf (B, P, S) f32."""
    B, P, S = z.shape
    RT = _RT
    assert (RT * S) % _T == 0, S
    Pp = rays8.shape[1]
    z_pad = (
        z if Pp == P
        else jnp.zeros((B, Pp, S), jnp.float32).at[:, :P].set(z)
    )
    tfi = jnp.zeros((B, 16, 8), jnp.float32).at[:, :12, 0].set(tf_inv12)

    V_ = pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_object_query_z_kernel, relu=relu),
        grid=(B, Pp // RT),
        in_specs=[
            pl.BlockSpec((1, RT, 8), lambda b, t: (b, t, 0), memory_space=V_),
            pl.BlockSpec((1, RT, S), lambda b, t: (b, t, 0), memory_space=V_),
            pl.BlockSpec((1, 16, 8), lambda b, t: (b, 0, 0), memory_space=V_),
        ] + _mlp_specs(),
        out_specs=pl.BlockSpec(
            (1, 8, RT * S), lambda b, t: (b, 0, t), memory_space=V_
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, Pp * S), jnp.float32),
        interpret=interpret,
    )(rays8, z_pad, tfi, plan_arr, *_mlp_args(pack))
    return out[:, 0, : P * S].reshape(B, P, S)


# --------------------------------------------------------------------------
# Analytic cost model
# --------------------------------------------------------------------------

def sampler_query_flops_per_step(scene, n_rays: int) -> float:
    """Analytic FLOPs/step of the fused sampler queries (all nodes).

    Pallas kernels report zero FLOPs to XLA's cost analysis, so bench MFU
    numbers computed from `compiled.cost_analysis()` alone undercount the
    sampler stage once the fused path is active.  This counts the dominant
    terms per queried point — the 8x256 trunk matmuls, the KNN distance
    matmul against the padded vertex table and the skinning blends — times
    the per-step query count: every refinement round queries N_samples_eval
    fresh points per ray (render/ray_sampler.py error_bound_z_vals).
    """
    cfg = scene.sampler_cfg
    pts_per_ray = cfg.N_samples_eval * cfg.max_total_iters
    total = 0.0
    for nid in scene.node_ids:
        plan = scene.plans[nid].implicit
        if not supports_fused_query(plan):
            continue
        # trunk: 2 MACs per weight element (incl. the zero-padded columns the
        # kernel really multiplies); matches pack_trunk_weights layout
        E, H, Hp = _EMB_ROWS, 256, 224
        f = 2.0 * (E * H + 3 * H * H + Hp * H + H * Hp + E * H + 3 * H * H + H)
        if nid in ("right", "left"):
            K = scene.plans[nid].knn_k
            Vp = _round_up(778, 128)
            Jp = _round_up(16, 8)
            # distance matmul + top-K scan + weight/tf blends + affine solve
            f += 2.0 * 3 * Vp + Vp * K + 2.0 * K * Jp + 2.0 * 16 * Jp + 120
        else:
            f += 2.0 * 9 + 6  # rigid inverse-affine apply
        total += f * pts_per_ray * n_rays
    return total
