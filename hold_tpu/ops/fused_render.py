"""Fused inference render query: warp + SDF trunk + normals + color in VMEM.

The eval-side per-point pipeline (reference: the no-grad render path through
code/src/model/renderables/node.py:60-109 + volsdf_utils.py:51-105 +
texture_net.py:60-101) is stop-gradient end to end, so — like the sampler
query in ops/fused_query.py — it can run as ONE Pallas kernel per tile:

    world points (T=512 tile)
      -> deformed->canonical warp      (hand: fused KNN vs POSED verts,
                                        blend, affine inverse; object: rigid)
      -> skinning Jacobian inverse     (hand: second KNN vs CANONICAL verts,
                                        3x3 adjugate; object: per-frame Rinv)
      -> Fourier/BARF embedding + 8x256 softplus100 trunk (bf16 MXU, f32
         accumulate), storing per-layer sigmoid factors
      -> width-1 f32 SDF head; feature head (256)
      -> IN-KERNEL reverse pass through the scalar head only (transposed
         bf16 matmuls against the stored sigmoid factors) -> dSDF/dx_c
      -> normal n_j = sum_i g_i (J^-1)_ij, safe-normalised
      -> color MLP ('pose' mode: [x_c, n, pose-embed, feat(+time code)],
         4x256 relu + f32 sigmoid; the per-frame pose-embed/time-code
         contribution enters as a precomputed layer-0 frame bias — 'pose'
         mode takes no view dirs, texture_net.py:60-78)

Eight HBM-bound XLA ops (warp, jinv, trunk fwd, trunk vjp, feature head,
normal algebra, color net, concats) collapse into one kernel; per-point HBM
traffic drops from ~4 KB of streamed intermediates to 32 B in / 64 B out.

Used by models/nodes.py when training=False on TPU (full-frame val renders,
render_cli, evaluate, visualize) — the training grad path is untouched.
Parity: tests/test_fused_render.py pins the kernel (interpret mode) against
the XLA shade path at bf16 tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_query import (
    _EMB_ROWS,
    _T,
    _knn_warp_from_xyz,
    _mlp_args,
    _mlp_specs,
    _softplus100,
    supports_fused_query,
)
from .knn import _CLAMP, _inv3_planes, _round_up, _xyz_rows, kth_smallest

# layer-0 column layout of the 'pose'-mode rendering net
# (mlp.apply_rendering_net): [points 3 | normals 3 | pose_embed 8 | features]
_C0A = 16  # in-kernel block: [x_c 3 | normal 3 | pad 10]


def supports_fused_render(implicit_plan: dict, rendering_plan: dict) -> bool:
    """True when both nets match the kernel's static pattern."""
    dims = rendering_plan["dims"]
    return (
        supports_fused_query(implicit_plan)
        and rendering_plan["mode"] == "pose"
        and rendering_plan.get("multires_view", -1) <= 0
        and len(dims) == 6
        and all(d == 256 for d in dims[1:5])
        and dims[5] == 3
        and dims[0] >= 14 + 256
    )


# --------------------------------------------------------------------------
# Host/XLA-side packing
# --------------------------------------------------------------------------

def pack_trunk_transposed(resolved: dict, plan: dict) -> dict:
    """Transposed bf16 trunk weights for the in-kernel reverse pass.

    Same splits/prescaling as fused_query.pack_trunk_weights (skip layer
    /sqrt2 baked in, zero pad rows/cols), so forward and backward see
    identical effective weights."""
    layers = resolved["layers"]
    E = 3 * (2 * plan["multires"] + 1)
    s2 = float(np.sqrt(2.0))

    def bf(x):
        return jnp.asarray(x, jnp.bfloat16)

    w0 = jnp.zeros((256, _EMB_ROWS), jnp.float32).at[:, :E].set(
        layers[0]["w"][:, :E]
    )
    w4 = layers[4]["w"]
    w4e = jnp.zeros((256, _EMB_ROWS), jnp.float32).at[:, :E].set(
        w4[:, 217 : 217 + E] / s2
    )
    w3 = jnp.zeros((224, 256), jnp.float32).at[:217].set(layers[3]["w"])
    w4h = jnp.zeros((256, 224), jnp.float32).at[:, :217].set(w4[:, :217] / s2)
    return {
        "W0T": bf(w0.T),  # (EMB_ROWS, 256)
        "W1T": bf(layers[1]["w"].T),
        "W2T": bf(layers[2]["w"].T),
        "W3T": bf(w3.T),  # (256, 224)
        "W4hT": bf(w4h.T),  # (224, 256)
        "W4eT": bf(w4e.T),  # (EMB_ROWS, 256)
        "W5T": bf(layers[5]["w"].T),
        "W6T": bf(layers[6]["w"].T),
        "W7T": bf(layers[7]["w"].T),
        # scalar head, pre-transposed (avoids an in-kernel 1x256 relayout)
        "head_wT": jnp.zeros((256, 8), jnp.float32).at[:, 0].set(
            jnp.asarray(layers[8]["w"][0, :], jnp.float32)
        ),
        # feature head (rows 1: of the output layer), forward orientation
        "feat_w": bf(layers[8]["w"][1:, :]),  # (256, 256)
    }


def pack_color_weights(resolved: dict, implicit_resolved: dict) -> dict:
    """Resolved rendering {'layers'} -> kernel operands (bf16 weights).

    Layer 0 is split by input segment: C0a covers [x_c, normal] (cols 0:6,
    padded to 16 rows in-kernel), C0f covers the 256 feature columns
    (cols 14:270).  The pose-embed columns (6:14) and any time-code columns
    (270:) are frame-constant — their contribution plus b0 arrives as the
    per-frame `frame_bias0` operand, NOT in this pack.  cbias col 0 carries
    the trunk's feature-head bias (output rows 1:)."""
    layers = resolved["layers"]
    w0 = layers[0]["w"]  # (256, 270[+32])

    def bf(x):
        return jnp.asarray(x, jnp.bfloat16)

    c0a = jnp.zeros((256, _C0A), jnp.float32).at[:, 0:6].set(w0[:, 0:6])
    c4 = jnp.zeros((8, 256), jnp.float32).at[:3].set(layers[4]["w"])
    cbias = jnp.zeros((256, 8), jnp.float32)
    cbias = cbias.at[:, 0].set(implicit_resolved["layers"][8]["b"][1:])
    for l in range(1, 4):
        cbias = cbias.at[:, l].set(layers[l]["b"])
    cbias = cbias.at[:3, 4].set(layers[4]["b"])
    return {
        "C0a": bf(c0a),
        "C0f": bf(w0[:, 14 : 14 + 256]),
        "C1": bf(layers[1]["w"]),
        "C2": bf(layers[2]["w"]),
        "C3": bf(layers[3]["w"]),
        "C4": bf(c4),
        "cbias": cbias,
    }


def frame_bias0(resolved: dict, pose_embed: jnp.ndarray,
                time_code: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-frame layer-0 bias: b0 + W0[:,6:14] @ pe (+ W0[:,270:] @ tc).

    pose_embed (B, 8) — lin_pose output (zeros for the object node);
    time_code (B, 32) or None. Returns (B, 256) f32."""
    w0 = resolved["layers"][0]["w"]
    fb = resolved["layers"][0]["b"][None, :] + pose_embed @ w0[:, 6:14].T
    if time_code is not None:
        fb = fb + time_code @ w0[:, 14 + 256 :].T
    return fb.astype(jnp.float32)


# --------------------------------------------------------------------------
# Kernel body pieces
# --------------------------------------------------------------------------

def _trunk_fwd_store(xc3, plan_ref, w0, w1, w2, w3, w4h, w4e, w5, w6, w7,
                     b_ref, hw_ref, hb_ref):
    """Forward trunk keeping what the reverse pass needs.

    Returns (sdf (1,T) f32, h7 (256,T) f32, arg (EMB_ROWS,T) f32,
    sig: list of 8 bf16 sigmoid factors — softplus100' = sigmoid(100 a))."""
    plan = plan_ref[:]
    spread = plan[:, 4:7]
    arg = jax.lax.dot_general(
        spread, xc3, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
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

    sig = []
    h = emb16
    for l, w_ref in enumerate((w0, w1, w2, w3)):
        a = lin(w_ref, h, l)
        sig.append(jax.nn.sigmoid(100.0 * a).astype(jnp.bfloat16))
        h = _softplus100(a).astype(jnp.bfloat16)
    a4 = lin(w4h, h, 4) + jax.lax.dot_general(
        w4e[:], emb16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sig.append(jax.nn.sigmoid(100.0 * a4).astype(jnp.bfloat16))
    h = _softplus100(a4).astype(jnp.bfloat16)
    for l, w_ref in enumerate((w5, w6, w7), start=5):
        a = lin(w_ref, h, l)
        sig.append(jax.nn.sigmoid(100.0 * a).astype(jnp.bfloat16))
        h = _softplus100(a)
        if l < 7:
            h = h.astype(jnp.bfloat16)
    h7 = h  # f32 (256, T)
    sdf = jax.lax.dot_general(
        hw_ref[:], h7, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + hb_ref[0, 0]
    return sdf, h7, arg, sig


def _trunk_bwd_xc(plan_ref, arg, sig, hwt_ref,
                  w0t, w1t, w2t, w3t, w4ht, w4et, w5t, w6t, w7t):
    """Reverse through the scalar head only: returns dSDF/dx_c (3, T) f32."""

    def tlin(wt_ref, da):
        return jax.lax.dot_general(
            wt_ref[:], da.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    T = arg.shape[1]
    dh7 = jnp.broadcast_to(hwt_ref[:, 0:1], (256, T))  # seed dsdf = 1
    da7 = dh7 * sig[7]
    da6 = tlin(w7t, da7) * sig[6]
    da5 = tlin(w6t, da6) * sig[5]
    da4 = tlin(w5t, da5) * sig[4]
    da3 = tlin(w4ht, da4) * sig[3]  # (224, T)
    demb = tlin(w4et, da4)  # (EMB_ROWS, T)
    da2 = tlin(w3t, da3) * sig[2]
    da1 = tlin(w2t, da2) * sig[1]
    da0 = tlin(w1t, da1) * sig[0]
    demb = demb + tlin(w0t, da0)

    plan = plan_ref[:]
    # d emb/d arg = (mask_x + mask_sin*cos(arg) - mask_cos*sin(arg)) * window
    darg = demb * (
        plan[:, 0:1]
        + plan[:, 1:2] * jnp.cos(arg)
        - plan[:, 2:3] * jnp.sin(arg)
    ) * plan[:, 3:4]
    return jax.lax.dot_general(
        plan[:, 4:7], darg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3, T)


def _color_mlp(xc3, nrm3, feat, c0a, c0f, c1, c2, c3, c4, cb_ref, fb_ref):
    """'pose'-mode rendering net, lanes-major. Returns rgb (3, T) f32."""
    T = xc3.shape[1]
    inp = jnp.concatenate(
        [xc3, nrm3, jnp.zeros((_C0A - 6, T), jnp.float32)], axis=0
    ).astype(jnp.bfloat16)
    h = (
        jax.lax.dot_general(
            c0a[:], inp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            c0f[:], feat.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + fb_ref[0, :, 0:1]  # per-frame bias: b0 + pose-embed/time-code terms
    )
    h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    for l, w_ref in enumerate((c1, c2, c3), start=1):
        h = jax.lax.dot_general(
            w_ref[:], h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + cb_ref[:, l : l + 1]
        h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        c4[:], h, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + cb_ref[:8, 4:5]
    return jax.nn.sigmoid(out[:3])  # f32 (sigmoid stays f32, mlp.py:364)


# shared operand layout after the per-entity refs + plan_ref:
#   ops[:12]   trunk forward (W0..W7 splits, bias pack, head w, head b)
#   ops[12:23] reverse pass (9 transposed trunk weights, head_wT, feat_w)
#   ops[23:29] color weights (C0a, C0f, C1, C2, C3, C4)
#   ops[29]    cbias, ops[30] frame_bias0, ops[31] out_ref

def _shade_common(xc_list, jinv, plan_ref, ops, extra_row):
    """Shared trunk+normal+color tail. xc_list: 3 (1,T) planes; jinv: 9
    (1,T) planes (row-major); extra_row: (1,T) diagnostic (nearest-dist)."""
    fwd = ops[:12]
    bwd = ops[12:23]
    col = ops[23:29]
    cb_ref, fb_ref, out_ref = ops[29], ops[30], ops[31]

    xc3 = jnp.concatenate(xc_list, axis=0)
    sdf, h7, arg, sig = _trunk_fwd_store(xc3, plan_ref, *fwd)
    g = _trunk_bwd_xc(plan_ref, arg, sig, bwd[9], *bwd[:9])
    feat = jax.lax.dot_general(
        bwd[10][:], h7.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + cb_ref[:, 0:1]
    # n_j = sum_i g_i (J^-1)_{ij}  (volsdf_utils.py:98-102)
    n = [
        sum(g[i : i + 1] * jinv[3 * i + j] for i in range(3))
        for j in range(3)
    ]
    nsq = n[0] * n[0] + n[1] * n[1] + n[2] * n[2]
    denom = jnp.maximum(jnp.sqrt(nsq), 1e-6)
    n = [c / denom for c in n]
    nrm3 = jnp.concatenate(n, axis=0)
    rgb = _color_mlp(xc3, nrm3, feat, *col, cb_ref, fb_ref)
    out_ref[0] = jnp.concatenate(
        [sdf, rgb, nrm3, extra_row, xc3,
         jnp.zeros((5, sdf.shape[1]), jnp.float32)], axis=0
    )  # (16, T): [sdf, rgb3, nrm3, dist, xc3, pad5]


def _hand_render_kernel(pts_ref, vp_ref, vpsq_ref, vc_ref, vcsq_ref, w_ref,
                        tf16_ref, tf9_ref, plan_ref, *ops, K):
    pts = pts_ref[0]
    xyz, psq = _xyz_rows(pts)
    # warp vs POSED verts (deformer.py:84-105); nearest-dist for the outlier
    # mask shares the distance tile with the warp (CSE'd by the compiler)
    verts = vp_ref[0]
    cross = jax.lax.dot_general(
        verts[:, :3], xyz, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d2 = jnp.maximum(vpsq_ref[0] + psq - 2.0 * cross, 0.0)
    dist = jnp.sqrt(jnp.minimum(jnp.min(d2, axis=0, keepdims=True), _CLAMP))
    xc = _knn_warp_from_xyz(xyz, psq, verts, vpsq_ref[0], w_ref[0],
                            tf16_ref[0], K)
    # J^{-1}: KNN weights vs CANONICAL verts (deformer.py:70-82)
    xc3 = jnp.concatenate(xc, axis=0)
    ccross = jax.lax.dot_general(
        vc_ref[0][:, :3], xc3, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    csq = xc3[0:1] ** 2 + xc3[1:2] ** 2 + xc3[2:3] ** 2
    cd2 = jnp.maximum(vcsq_ref[0] + csq - 2.0 * ccross, 0.0)
    cd2c = jnp.minimum(cd2, _CLAMP)
    kth = kth_smallest(cd2, K, axis=0)
    conf = jnp.where(cd2 <= kth, jnp.exp(-cd2c), 0.0)
    conf = conf / jnp.sum(conf, axis=0, keepdims=True)
    wb = jax.lax.dot_general(
        w_ref[0], conf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    A = jax.lax.dot_general(
        tf9_ref[0], wb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16, T): rows 3i+m = R_im
    r = [A[3 * i + m : 3 * i + m + 1] for i in range(3) for m in range(3)]
    jinv = _inv3_planes(r)
    _shade_common(xc, jinv, plan_ref, ops, dist)


def _object_render_kernel(pts_ref, tfi_ref, plan_ref, *ops):
    pts = pts_ref[0]
    xyz, _ = _xyz_rows(pts)
    tfi = tfi_ref[0]  # (16, 8): col 0 = [Rinv row-major 9 | t 3 | ...]
    diff = [xyz[m : m + 1] - tfi[9 + m : 10 + m, 0:1] for m in range(3)]
    xc = [
        sum(tfi[3 * i + m : 3 * i + m + 1, 0:1] * diff[m] for m in range(3))
        for i in range(3)
    ]
    T = xyz.shape[1]
    # rigid deformer: J = R constant per frame, J^{-1} = Rinv
    jinv = [
        jnp.broadcast_to(tfi[3 * i + m : 3 * i + m + 1, 0:1], (1, T))
        for i in range(3) for m in range(3)
    ]
    zero = jnp.zeros((1, T), jnp.float32)
    _shade_common(xc, jinv, plan_ref, ops, zero)


# --------------------------------------------------------------------------
# pallas_call wrappers
# --------------------------------------------------------------------------

def _bwd_specs():
    full = lambda i, j: (0, 0)  # noqa: E731
    V = pltpu.VMEM
    return [
        pl.BlockSpec((_EMB_ROWS, 256), full, memory_space=V),  # W0T
        pl.BlockSpec((256, 256), full, memory_space=V),  # W1T
        pl.BlockSpec((256, 256), full, memory_space=V),  # W2T
        pl.BlockSpec((256, 224), full, memory_space=V),  # W3T
        pl.BlockSpec((224, 256), full, memory_space=V),  # W4hT
        pl.BlockSpec((_EMB_ROWS, 256), full, memory_space=V),  # W4eT
        pl.BlockSpec((256, 256), full, memory_space=V),  # W5T
        pl.BlockSpec((256, 256), full, memory_space=V),  # W6T
        pl.BlockSpec((256, 256), full, memory_space=V),  # W7T
        pl.BlockSpec((256, 8), full, memory_space=V),  # head_wT
        pl.BlockSpec((256, 256), full, memory_space=V),  # feat_w
    ]


def _bwd_args(tpack_t):
    return (
        tpack_t["W0T"], tpack_t["W1T"], tpack_t["W2T"], tpack_t["W3T"],
        tpack_t["W4hT"], tpack_t["W4eT"], tpack_t["W5T"], tpack_t["W6T"],
        tpack_t["W7T"], tpack_t["head_wT"], tpack_t["feat_w"],
    )


def _color_specs():
    full = lambda i, j: (0, 0)  # noqa: E731
    V = pltpu.VMEM
    return [
        pl.BlockSpec((256, _C0A), full, memory_space=V),  # C0a
        pl.BlockSpec((256, 256), full, memory_space=V),  # C0f
        pl.BlockSpec((256, 256), full, memory_space=V),  # C1
        pl.BlockSpec((256, 256), full, memory_space=V),  # C2
        pl.BlockSpec((256, 256), full, memory_space=V),  # C3
        pl.BlockSpec((8, 256), full, memory_space=V),  # C4
        pl.BlockSpec((256, 8), full, memory_space=V),  # cbias
        pl.BlockSpec((1, 256, 8), lambda b, t: (b, 0, 0),
                     memory_space=V),  # frame_bias0
    ]


def _color_args(cpack, fb0):
    B = fb0.shape[0]
    fb8 = jnp.zeros((B, 256, 8), jnp.float32).at[:, :, 0].set(fb0)
    return (
        cpack["C0a"], cpack["C0f"], cpack["C1"], cpack["C2"], cpack["C3"],
        cpack["C4"], cpack["cbias"], fb8,
    )


def _split_out(out, N):
    """(B, 16, Np) -> sdf (B,N), rgb (B,N,3), nrm (B,N,3), dist (B,N),
    xc (B,N,3)."""
    sdf = out[:, 0, :N]
    rgb = jnp.swapaxes(out[:, 1:4, :N], 1, 2)
    nrm = jnp.swapaxes(out[:, 4:7, :N], 1, 2)
    dist = out[:, 7, :N]
    xc = jnp.swapaxes(out[:, 8:11, :N], 1, 2)
    return sdf, rgb, nrm, dist, xc


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def fused_hand_render(pts, verts_posed, verts_c, skin_weights, tfs,
                      plan_arr, tpack, tpack_t, cpack, fb0,
                      K: int = 15, interpret: bool = False):
    """(B,N,3) world pts -> (sdf (B,N), rgb (B,N,3), normal (B,N,3),
    nearest-dist (B,N), x_c (B,N,3))."""
    B, N = pts.shape[:2]
    V, J = verts_posed.shape[1], skin_weights.shape[2]
    Np = _round_up(N, _T)
    Vp = _round_up(V, 128)
    Jp = _round_up(J, 8)

    pts_pad = jnp.zeros((B, Np, 8), jnp.float32).at[:, :N, :3].set(pts)
    vp = jnp.zeros((B, Vp, 8), jnp.float32).at[:, :V, :3].set(verts_posed)
    vpsq = jnp.full((B, Vp, 1), 1e9, jnp.float32).at[:, :V, 0].set(
        jnp.sum(verts_posed * verts_posed, axis=-1)
    )
    vc = jnp.zeros((B, Vp, 8), jnp.float32).at[:, :V, :3].set(verts_c)
    vcsq = jnp.full((B, Vp, 1), 1e9, jnp.float32).at[:, :V, 0].set(
        jnp.sum(verts_c * verts_c, axis=-1)
    )
    w_pad = jnp.zeros((B, Vp, Jp), jnp.float32).at[:, :V, :J].set(skin_weights)
    tf16 = jnp.zeros((B, 16, Jp), jnp.float32).at[:, :, :J].set(
        jnp.swapaxes(tfs.reshape(B, J, 16), 1, 2)
    )
    tf9 = jnp.zeros((B, 16, Jp), jnp.float32).at[:, :9, :J].set(
        jnp.swapaxes(tfs[:, :, :3, :3].reshape(B, J, 9), 1, 2)
    )

    V_ = pltpu.VMEM
    out = pl.pallas_call(
        functools.partial(_hand_render_kernel, K=K),
        grid=(B, Np // _T),
        in_specs=[
            pl.BlockSpec((1, _T, 8), lambda b, t: (b, t, 0), memory_space=V_),
            pl.BlockSpec((1, Vp, 8), lambda b, t: (b, 0, 0), memory_space=V_),
            pl.BlockSpec((1, Vp, 1), lambda b, t: (b, 0, 0), memory_space=V_),
            pl.BlockSpec((1, Vp, 8), lambda b, t: (b, 0, 0), memory_space=V_),
            pl.BlockSpec((1, Vp, 1), lambda b, t: (b, 0, 0), memory_space=V_),
            pl.BlockSpec((1, Vp, Jp), lambda b, t: (b, 0, 0), memory_space=V_),
            pl.BlockSpec((1, 16, Jp), lambda b, t: (b, 0, 0), memory_space=V_),
            pl.BlockSpec((1, 16, Jp), lambda b, t: (b, 0, 0), memory_space=V_),
        ] + _mlp_specs() + _bwd_specs() + _color_specs(),
        out_specs=pl.BlockSpec(
            (1, 16, _T), lambda b, t: (b, 0, t), memory_space=V_
        ),
        out_shape=jax.ShapeDtypeStruct((B, 16, Np), jnp.float32),
        interpret=interpret,
    )(pts_pad, vp, vpsq, vc, vcsq, w_pad, tf16, tf9, plan_arr,
      *_mlp_args(tpack), *_bwd_args(tpack_t), *_color_args(cpack, fb0))
    return _split_out(out, N)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_object_render(pts, tf_inv12, plan_arr, tpack, tpack_t, cpack,
                        fb0, interpret: bool = False):
    """(B,N,3) world pts + per-frame inverse affine (B,12: Rinv row-major 9
    | t 3) -> same outputs as fused_hand_render (dist row is zeros)."""
    B, N = pts.shape[:2]
    Np = _round_up(N, _T)
    pts_pad = jnp.zeros((B, Np, 8), jnp.float32).at[:, :N, :3].set(pts)
    tfi = jnp.zeros((B, 16, 8), jnp.float32).at[:, :12, 0].set(tf_inv12)

    V_ = pltpu.VMEM
    out = pl.pallas_call(
        _object_render_kernel,
        grid=(B, Np // _T),
        in_specs=[
            pl.BlockSpec((1, _T, 8), lambda b, t: (b, t, 0), memory_space=V_),
            pl.BlockSpec((1, 16, 8), lambda b, t: (b, 0, 0), memory_space=V_),
        ] + _mlp_specs() + _bwd_specs() + _color_specs(),
        out_specs=pl.BlockSpec(
            (1, 16, _T), lambda b, t: (b, 0, t), memory_space=V_
        ),
        out_shape=jax.ShapeDtypeStruct((B, 16, Np), jnp.float32),
        interpret=interpret,
    )(pts_pad, tfi, plan_arr, *_mlp_args(tpack), *_bwd_args(tpack_t),
      *_color_args(cpack, fb0))
    return _split_out(out, N)
