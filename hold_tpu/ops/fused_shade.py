"""Fused TRAINING shade: trunk + normals + color as one custom-VJP Pallas op.

Round-3 profiling showed the training grad stage (445 ms at 10k rays) spread
across ~3,600 small XLA fusions + 8k async copies per step, with 16.3 GB of
temp HBM at 10,240 rays (OOM at 20,480) — the chunked-XLA shade path
(models/nodes.py + ops/chunk.py) streams every per-point intermediate through
HBM and defeats the buffer allocator.  This module replaces it for training:

    forward  = ONE Pallas kernel per (frame, tile): PE -> 8x256 softplus100
               trunk (bf16 MXU) -> f32 SDF head + feature head -> in-kernel
               reverse pass for dSDF/dx_c -> normal = Jinv^T g, normalised ->
               'pose'-mode color MLP.  Saves NOTHING but the op inputs.
    backward = ONE Pallas kernel per (frame, tile) that RECOMPUTES the tile
               forward in VMEM and applies jax.vjp over the same tile math —
               the full second-order chain (loss -> rgb -> normal -> dSDF/dx_c
               -> trunk Hessian) is derived by JAX inside the kernel trace,
               so the hand-written part is only the tile plumbing.  Weight
               cotangents accumulate across the grid in f32 (sequential TPU
               grid), per-frame bias cotangents accumulate per frame.

Per-point HBM traffic drops from ~2.5 KB of streamed activations + residuals
to 112 B in / 28 B out (fwd) + 140 B (bwd), and the fwd->bwd residual is just
the op inputs — the 16.3 GB step fits in ~1 GB.

The op consumes the SAME packed-weight layout as ops/fused_render.py
(pack_trunk_weights / pack_trunk_transposed / pack_color_weights /
frame_bias0), all built from the live params inside jit, so parameter
gradients flow through the packing transposes automatically.

Replaces the reference's per-point autograd chain at
code/src/model/renderables/node.py:60-109 + engine/volsdf_utils.py:51-105 +
networks/texture_net.py:60-101 for the training path; numerical parity with
the XLA shade path is pinned by tests/test_fused_shade.py (interpret mode).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_query import _EMB_ROWS, _softplus100
from .knn import _round_up

_T = 256  # fwd points per tile
_T_BWD = 256  # bwd tile: in-kernel jax.vjp residuals + both weight packs +
# f32 weight-grad accumulators measured 22.5 MB at 256 — above Mosaic's
# DEFAULT 16 MB scoped-vmem budget but far below the v5e's 128 MiB physical
# VMEM, so the backward call raises the budget via CompilerParams
_VMEM_BUDGET = 100 * 1024 * 1024


# --------------------------------------------------------------------------
# Pure tile math (shared verbatim by fwd kernel and the in-kernel jax.vjp)
# --------------------------------------------------------------------------

def _shade_tile(xc3, jinv, fb, plan, tw, bw, cw):
    """xc3 (3,T) f32, jinv (9,T) f32 row-major, fb (256,1) f32 frame bias,
    plan (EMB_ROWS,8); tw/bw/cw = trunk fwd / transposed / color weight dicts
    (values, not refs).  Returns (sdf (1,T) f32, rgb (3,T) f32, nrm (3,T)).

    Math identical to ops/fused_render._shade_common, expressed over values
    so jax.vjp can differentiate it inside the backward kernel."""
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

    def lin(w, h, l):
        out = jax.lax.dot_general(
            w, h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out + tw["bias"][: out.shape[0], l : l + 1]

    sig = []
    h = emb16
    for l, wk in enumerate(("W0", "W1", "W2", "W3")):
        a = lin(tw[wk], h, l)
        sig.append(jax.nn.sigmoid(100.0 * a).astype(jnp.bfloat16))
        h = _softplus100(a).astype(jnp.bfloat16)
    a4 = lin(tw["W4h"], h, 4) + jax.lax.dot_general(
        tw["W4e"], emb16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sig.append(jax.nn.sigmoid(100.0 * a4).astype(jnp.bfloat16))
    h = _softplus100(a4).astype(jnp.bfloat16)
    for l, wk in enumerate(("W5", "W6", "W7"), start=5):
        a = lin(tw[wk], h, l)
        sig.append(jax.nn.sigmoid(100.0 * a).astype(jnp.bfloat16))
        h = _softplus100(a)
        if l < 7:
            h = h.astype(jnp.bfloat16)
    h7 = h  # f32 (256, T)
    sdf = jax.lax.dot_general(
        tw["head_w"], h7, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + tw["head_b"][0, 0]

    feat = jax.lax.dot_general(
        bw["feat_w"], h7.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + cw["cbias"][:, 0:1]

    # reverse pass through the scalar head for g = dSDF/dx_c — part of the
    # FORWARD value (normals), so jax.vjp over this function yields the
    # second-order (Hessian) terms the training gradient needs
    def tlin(wt, da):
        return jax.lax.dot_general(
            wt, da.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    T = arg.shape[1]
    dh7 = jnp.broadcast_to(bw["head_wT"][:, 0:1], (256, T))
    da7 = dh7 * sig[7]
    da6 = tlin(bw["W7T"], da7) * sig[6]
    da5 = tlin(bw["W6T"], da6) * sig[5]
    da4 = tlin(bw["W5T"], da5) * sig[4]
    da3 = tlin(bw["W4hT"], da4) * sig[3]
    demb = tlin(bw["W4eT"], da4)
    da2 = tlin(bw["W3T"], da3) * sig[2]
    da1 = tlin(bw["W2T"], da2) * sig[1]
    da0 = tlin(bw["W1T"], da1) * sig[0]
    demb = demb + tlin(bw["W0T"], da0)
    darg = demb * (
        plan[:, 0:1]
        + plan[:, 1:2] * jnp.cos(arg)
        - plan[:, 2:3] * jnp.sin(arg)
    ) * plan[:, 3:4]
    g = jax.lax.dot_general(
        spread, darg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3, T)

    n = [
        sum(g[i : i + 1] * jinv[3 * i + j : 3 * i + j + 1] for i in range(3))
        for j in range(3)
    ]
    # +1e-12 inside the sqrt (utils.transforms.safe_norm semantics): a plain
    # sqrt backprops inf at n = 0, and padded lanes' 0-cotangent * inf = NaN
    # would poison the accumulated WEIGHT grads in the backward kernel
    nsq = n[0] * n[0] + n[1] * n[1] + n[2] * n[2]
    denom = jnp.maximum(jnp.sqrt(nsq + 1e-12), 1e-6)
    nrm3 = jnp.concatenate([c / denom for c in n], axis=0)

    # color MLP ('pose' mode): [x_c, n | (pe enters via fb) | feat]
    inp = jnp.concatenate(
        [xc3, nrm3, jnp.zeros((16 - 6, T), jnp.float32)], axis=0
    ).astype(jnp.bfloat16)
    hc = (
        jax.lax.dot_general(
            cw["C0a"], inp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + jax.lax.dot_general(
            cw["C0f"], feat.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + fb
    )
    hc = jnp.maximum(hc, 0.0).astype(jnp.bfloat16)
    for l, wk in enumerate(("C1", "C2", "C3"), start=1):
        hc = jax.lax.dot_general(
            cw[wk], hc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + cw["cbias"][:, l : l + 1]
        hc = jnp.maximum(hc, 0.0).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        cw["C4"], hc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + cw["cbias"][:8, 4:5]
    rgb = jax.nn.sigmoid(out[:3])
    return sdf, rgb, nrm3


# canonical leaf order for the three weight dicts
_TW_KEYS = ("W0", "W1", "W2", "W3", "W4h", "W4e", "W5", "W6", "W7",
            "bias", "head_w", "head_b")
_BW_KEYS = ("W0T", "W1T", "W2T", "W3T", "W4hT", "W4eT", "W5T", "W6T", "W7T",
            "head_wT", "feat_w")
_CW_KEYS = ("C0a", "C0f", "C1", "C2", "C3", "C4", "cbias")


def _flatten_packs(tw, bw, cw):
    return tuple(
        [tw[k] for k in _TW_KEYS]
        + [bw[k] for k in _BW_KEYS]
        + [cw[k] for k in _CW_KEYS]
    )


def _unflatten_packs(leaves):
    nt, nb = len(_TW_KEYS), len(_BW_KEYS)
    tw = dict(zip(_TW_KEYS, leaves[:nt]))
    bw = dict(zip(_BW_KEYS, leaves[nt : nt + nb]))
    cw = dict(zip(_CW_KEYS, leaves[nt + nb :]))
    return tw, bw, cw


def _full_spec(arr):
    shape = arr.shape
    return pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------

def _fwd_kernel(xc_ref, jinv_ref, fb_ref, plan_ref, *refs):
    w_refs, out_ref = refs[:-1], refs[-1]
    leaves = tuple(r[:] for r in w_refs)
    tw, bw, cw = _unflatten_packs(leaves)
    sdf, rgb, nrm = _shade_tile(
        xc_ref[0][:3], jinv_ref[0][:9], fb_ref[0][:, 0:1], plan_ref[:],
        tw, bw, cw,
    )
    pad = jnp.zeros((1, sdf.shape[1]), jnp.float32)
    out_ref[0] = jnp.concatenate([sdf, rgb, nrm, pad], axis=0)  # (8, T)


def _bwd_kernel(xc_ref, jinv_ref, fb_ref, plan_ref, ct_ref, *refs):
    nw = len(_TW_KEYS) + len(_BW_KEYS) + len(_CW_KEYS)
    w_refs = refs[:nw]
    din_ref, dfb_ref = refs[nw], refs[nw + 1]
    dw_refs = refs[nw + 2 :]
    assert len(dw_refs) == nw

    b = pl.program_id(0)
    t = pl.program_id(1)

    leaves = tuple(r[:] for r in w_refs)
    plan = plan_ref[:]
    xc3 = xc_ref[0][:3]
    jinv = jinv_ref[0][:9]
    fb = fb_ref[0][:, 0:1]

    def f(xc3, jinv, fb, *leaves):
        tw, bw, cw = _unflatten_packs(leaves)
        return _shade_tile(xc3, jinv, fb, plan, tw, bw, cw)

    _, vjp = jax.vjp(f, xc3, jinv, fb, *leaves)
    ct = ct_ref[0]  # (8, T): [gsdf, grgb3, gnrm3, pad]
    grads = vjp((ct[0:1], ct[1:4], ct[4:7]))
    dxc, djinv, dfb = grads[0], grads[1], grads[2]
    dws = grads[3:]

    din_ref[0] = jnp.concatenate(
        [dxc, djinv, jnp.zeros((4, dxc.shape[1]), jnp.float32)], axis=0
    )  # (16, T)

    @pl.when(t == 0)
    def _init_fb():
        dfb_ref[0] = jnp.broadcast_to(dfb, (256, 8))

    @pl.when(t > 0)
    def _acc_fb():
        dfb_ref[0] = dfb_ref[0] + jnp.broadcast_to(dfb, (256, 8))

    first = (b == 0) & (t == 0)
    for r, dw in zip(dw_refs, dws):
        dw32 = dw.astype(jnp.float32)

        @pl.when(first)
        def _init(r=r, dw32=dw32):
            r[...] = dw32

        @pl.when(jnp.logical_not(first))
        def _acc(r=r, dw32=dw32):
            r[...] = r[...] + dw32


# --------------------------------------------------------------------------
# custom_vjp wrapper
# --------------------------------------------------------------------------

def _fwd_call(xc_lm, jinv_lm, fb, plan_arr, leaves, interpret):
    """xc_lm (B,8,Np), jinv_lm (B,16,Np), fb (B,256,8)."""
    B, _, Np = xc_lm.shape
    V = pltpu.VMEM
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(B, Np // _T),
        in_specs=[
            pl.BlockSpec((1, 8, _T), lambda b, t: (b, 0, t), memory_space=V),
            pl.BlockSpec((1, 16, _T), lambda b, t: (b, 0, t), memory_space=V),
            pl.BlockSpec((1, 256, 8), lambda b, t: (b, 0, 0), memory_space=V),
            pl.BlockSpec((_EMB_ROWS, 8), lambda b, t: (0, 0), memory_space=V),
        ] + [_full_spec(a) for a in leaves],
        out_specs=pl.BlockSpec((1, 8, _T), lambda b, t: (b, 0, t),
                               memory_space=V),
        out_shape=jax.ShapeDtypeStruct((B, 8, Np), jnp.float32),
        interpret=interpret,
    )(xc_lm, jinv_lm, fb, plan_arr, *leaves)
    return out


def _bwd_call(xc_lm, jinv_lm, fb, plan_arr, leaves, ct, interpret):
    B, _, Np = xc_lm.shape
    T = _T_BWD
    V = pltpu.VMEM
    din, dfb, *dws = pl.pallas_call(
        _bwd_kernel,
        grid=(B, Np // T),
        in_specs=[
            pl.BlockSpec((1, 8, T), lambda b, t: (b, 0, t), memory_space=V),
            pl.BlockSpec((1, 16, T), lambda b, t: (b, 0, t), memory_space=V),
            pl.BlockSpec((1, 256, 8), lambda b, t: (b, 0, 0), memory_space=V),
            pl.BlockSpec((_EMB_ROWS, 8), lambda b, t: (0, 0), memory_space=V),
            pl.BlockSpec((1, 8, T), lambda b, t: (b, 0, t), memory_space=V),
        ] + [_full_spec(a) for a in leaves],
        out_specs=[
            pl.BlockSpec((1, 16, T), lambda b, t: (b, 0, t), memory_space=V),
            pl.BlockSpec((1, 256, 8), lambda b, t: (b, 0, 0), memory_space=V),
        ] + [_full_spec(a) for a in leaves],
        out_shape=[
            jax.ShapeDtypeStruct((B, 16, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, 256, 8), jnp.float32),
        ] + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in leaves],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET,
        ),
        interpret=interpret,
    )(xc_lm, jinv_lm, fb, plan_arr, ct, *leaves)
    return din, dfb, dws


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_shade_train(xc, jinv9, fb0, plan_arr, packs, n_valid,
                       interpret=False):
    out, _ = _fused_shade_fwd(xc, jinv9, fb0, plan_arr, packs, n_valid,
                              interpret)
    return out


def _prep(xc, jinv9, fb0):
    """(B,N,3)/(B,N,9)/(B,256) -> lanes-major padded kernel operands."""
    B, N = xc.shape[:2]
    Np = _round_up(N, _T)
    xc_lm = jnp.zeros((B, 8, Np), jnp.float32).at[:, :3, :N].set(
        jnp.swapaxes(xc, 1, 2)
    )
    jinv_lm = jnp.zeros((B, 16, Np), jnp.float32).at[:, :9, :N].set(
        jnp.swapaxes(jinv9, 1, 2)
    )
    fb = jnp.zeros((B, 256, 8), jnp.float32).at[:, :, 0].set(fb0)
    return xc_lm, jinv_lm, fb, Np


def _fused_shade_fwd(xc, jinv9, fb0, plan_arr, packs, n_valid, interpret):
    B, N = xc.shape[:2]
    leaves = _flatten_packs(*packs)
    xc_lm, jinv_lm, fb, Np = _prep(xc, jinv9, fb0)
    out = _fwd_call(xc_lm, jinv_lm, fb, plan_arr, leaves, interpret)
    sdf = out[:, 0, :N]
    rgb = jnp.swapaxes(out[:, 1:4, :N], 1, 2)
    nrm = jnp.swapaxes(out[:, 4:7, :N], 1, 2)
    return (sdf, rgb, nrm), (xc, jinv9, fb0, plan_arr, leaves)


def _fused_shade_bwd(interpret, res, cts):
    xc, jinv9, fb0, plan_arr, leaves = res
    g_sdf, g_rgb, g_nrm = cts
    B, N = xc.shape[:2]
    xc_lm, jinv_lm, fb, Np = _prep(xc, jinv9, fb0)
    ct = jnp.zeros((B, 8, Np), jnp.float32)
    ct = ct.at[:, 0, :N].set(g_sdf)
    ct = ct.at[:, 1:4, :N].set(jnp.swapaxes(g_rgb, 1, 2))
    ct = ct.at[:, 4:7, :N].set(jnp.swapaxes(g_nrm, 1, 2))
    din, dfb, dws = _bwd_call(xc_lm, jinv_lm, fb, plan_arr, leaves, ct,
                              interpret)
    dxc = jnp.swapaxes(din[:, :3, :N], 1, 2)
    djinv = jnp.swapaxes(din[:, 3:12, :N], 1, 2)
    dfb0 = jnp.sum(dfb[:, :, 0:1], axis=-1)
    nt, nb = len(_TW_KEYS), len(_BW_KEYS)
    dtw = {k: v.astype(l.dtype) for k, v, l in
           zip(_TW_KEYS, dws[:nt], leaves[:nt])}
    dbw = {k: v.astype(l.dtype) for k, v, l in
           zip(_BW_KEYS, dws[nt : nt + nb], leaves[nt : nt + nb])}
    dcw = {k: v.astype(l.dtype) for k, v, l in
           zip(_CW_KEYS, dws[nt + nb :], leaves[nt + nb :])}
    return dxc, djinv, dfb0, None, (dtw, dbw, dcw), None


_fused_shade_train.defvjp(_fused_shade_fwd, _fused_shade_bwd)


def fused_shade_train(xc, jinv9, fb0, plan_arr, tw, bw, cw,
                      interpret: bool = False):
    """Training shade: (B,N,3) canonical pts + (B,N,9) Jinv + (B,256) frame
    bias -> (sdf (B,N), rgb (B,N,3), normal (B,N,3)), differentiable w.r.t.
    everything except plan_arr."""
    return _fused_shade_train(xc, jinv9, fb0, plan_arr, (tw, bw, cw),
                              xc.shape[1], interpret)


# --------------------------------------------------------------------------
# Analytic cost model
# --------------------------------------------------------------------------

def shade_train_flops_per_step(scene, n_rays: int) -> float:
    """Analytic FLOPs/step of the fused training shade (fwd + custom bwd).

    Pallas ops report zero FLOPs to XLA's cost analysis, so once the fused
    training path is active the grad stage's MFU would be wildly undercounted
    without this.  Counts only matmul MACs (they dominate): every weight
    matrix W (m,k) in the three packs costs 2*m*k FLOPs per shaded point in
    the forward (incl. the in-kernel transposed pass for normals).  The
    backward RECOMPUTES the forward (1x) and its jax.vjp adds a data-grad and
    a weight-grad matmul per forward matmul (2x) -> total = 4x forward.
    Shaded points/ray = N_samples (final z-vals) per node.
    """
    # per-point fwd matmul weights: mirror of _shade_tile's dot_generals —
    # trunk fwd (tw), transposed normal pass + feat (bw), color MLP (cw)
    E, H, Hp = _EMB_ROWS, 256, 224
    mac_tw = E * H + 3 * H * H + H * Hp + E * H + 3 * H * H + H  # W0..head
    mac_bw = 8 * H * H + E * H + H * H  # W*T chain + W4eT + feat_w
    mac_cw = H * 16 + H * H + 3 * H * H + 8 * H  # C0a,C0f,C1-3,C4
    fwd_per_pt = 2.0 * (mac_tw + mac_bw + mac_cw)
    per_pt = 4.0 * fwd_per_pt  # fwd + (recompute + 2x vjp) in bwd

    from .fused_render import supports_fused_render

    total = 0.0
    cfg = scene.sampler_cfg
    # final z-vals per ray: N_samples + 2 boundary + N_samples_extra
    # (render/ray_sampler.py:172)
    pts_per_ray = cfg.N_samples + 2 + cfg.N_samples_extra
    for nid in scene.node_ids:
        plans = scene.plans[nid]
        if supports_fused_render(plans.implicit, plans.rendering):
            total += per_pt * pts_per_ray * n_rays
    return total
