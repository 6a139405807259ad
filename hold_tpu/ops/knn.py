"""KNN skinning-weight query + LBS warps — the training hot loop.

Semantics (parity with code/src/model/mano/deformer.py:84-105): for each query
point, find the K nearest canonical/posed MANO vertices by squared distance
(clamped at 4), blend their skinning weights with softmax-like confidences
exp(-d2)/sum, stop-gradient the result, and flag outliers whose nearest vertex
is farther than `max_dist`.

Two implementations:
- `knn_blend_weights_xla`: jnp reference (materialises the (P, V) distance
  matrix — fine for tests/small batches).
- `knn_blend_weights_pallas`: fused TPU kernel. Tiles query points; for each
  tile the (T, V) distances live only in VMEM, the top-K threshold is found by
  K iterative min-extractions on the VPU, and the weight blend is a (T, V) x
  (V, J) MXU matmul against a confidence-masked matrix. Nothing P x V ever
  touches HBM. No backward needed: the blended weights are stop-gradient by
  contract.

The blend is expressed threshold-style (conf masked to d2 <= kth smallest)
instead of gather-style — identical result modulo distance ties, and it maps
onto the MXU instead of a serialised gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.transforms import inverse_affine4

_CLAMP = 4.0


def kth_smallest(d2: jnp.ndarray, K: int, axis: int) -> jnp.ndarray:
    """K-th smallest along ``axis`` (keepdims), by K-1 READ-ONLY passes.

    Equivalent to the classic extract-and-mask loop
    (``work = where(work <= kth, BIG, work); kth = min(work)``) but never
    mutates the (T, V) work array: each pass recomputes the masked min from
    the original distances and the previous threshold.  The loop-carried
    state shrinks from the full tile to a (T, 1) threshold, which removes
    K-1 full-width VMEM writes per tile and lets Mosaic fuse
    compare+select+min into one pass over registers.  Tie semantics are
    IDENTICAL: both forms collapse duplicates equal to the running
    threshold, and the caller's final mask ``d2 <= kth`` re-includes them.
    """
    BIG = jnp.float32(1e9)
    kth = jnp.min(d2, axis=axis, keepdims=True)
    for _ in range(K - 1):
        kth = jnp.min(jnp.where(d2 > kth, d2, BIG), axis=axis, keepdims=True)
    return kth


def _pairwise_sqdist(pts: jnp.ndarray, verts: jnp.ndarray) -> jnp.ndarray:
    """(P,3),(V,3) -> (P,V) squared distances via the matmul identity."""
    p2 = jnp.sum(pts * pts, axis=-1, keepdims=True)
    v2 = jnp.sum(verts * verts, axis=-1)
    cross = pts @ verts.T
    return jnp.maximum(p2 + v2[None, :] - 2.0 * cross, 0.0)


def knn_blend_weights_xla(
    pts: jnp.ndarray,  # (B, P, 3)
    verts: jnp.ndarray,  # (B, V, 3)
    skin_weights: jnp.ndarray,  # (B, V, J)
    K: int = 15,
    max_dist: float = 0.1,
):
    """Returns (weights (B,P,J), outlier_mask (B,P))."""

    def one(p, v, w):
        d2 = jnp.minimum(_pairwise_sqdist(p, v), _CLAMP)
        neg_topk, idx = jax.lax.top_k(-d2, K)  # (P, K)
        d2k = -neg_topk
        conf = jnp.exp(-d2k)
        conf = conf / jnp.sum(conf, axis=-1, keepdims=True)
        wk = w[idx]  # (P, K, J)
        blended = jnp.sum(wk * conf[..., None], axis=1)
        min_dist = jnp.sqrt(d2k[:, 0])
        return blended, min_dist > max_dist

    weights, outlier = jax.vmap(one)(pts, verts, skin_weights)
    return jax.lax.stop_gradient(weights), outlier


# --------------------------------------------------------------------------
# Pallas kernel
# --------------------------------------------------------------------------

def _knn_kernel(pts_ref, verts_ref, vsq_ref, w_ref, out_w_ref, out_d_ref, *, K):
    """One grid step: a (T, 3) point tile against all (Vp, 3) vertices.

    Padded vertices carry vsq = +inf so they never enter the top-K.
    """
    pts = pts_ref[:]  # (T, 8) xyz padded
    verts = verts_ref[:]  # (Vp, 8)
    vsq = vsq_ref[:]  # (1, Vp) squared norms, +big on padding
    cross = jax.lax.dot_general(
        pts, verts, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (T, Vp)
    psq = jnp.sum(pts * pts, axis=-1, keepdims=True)
    d2 = jnp.maximum(psq + vsq - 2.0 * cross, 0.0)
    d2c = jnp.minimum(d2, _CLAMP)

    # kth smallest via K-1 read-only masked-min passes (kth_smallest);
    # also track the running min (for the outlier mask).
    first_min = jnp.min(d2, axis=-1, keepdims=True)  # (T, 1)
    kth = kth_smallest(d2, K, axis=-1)

    mask = d2 <= kth  # includes ties; padding excluded by construction
    conf = jnp.where(mask, jnp.exp(-d2c), 0.0)
    conf = conf / jnp.sum(conf, axis=-1, keepdims=True)
    out_w_ref[:] = jax.lax.dot_general(
        conf, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_d_ref[:] = jnp.sqrt(jnp.minimum(first_min, _CLAMP))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("K", "max_dist", "interpret"))
def _knn_pallas_single(pts, verts, skin_weights, K, max_dist, interpret=False):
    """(P,3),(V,3),(V,J) -> ((P,J), (P,))"""
    P, V, J = pts.shape[0], verts.shape[0], skin_weights.shape[1]
    T = 512
    Pp = _round_up(P, T)
    Vp = _round_up(V, 128)
    Jp = _round_up(J, 128)

    pts_pad = jnp.zeros((Pp, 8), jnp.float32).at[:P, :3].set(pts)
    verts_pad = jnp.zeros((Vp, 8), jnp.float32).at[:V, :3].set(verts)
    vsq = jnp.full((1, Vp), 1e9, jnp.float32).at[0, :V].set(
        jnp.sum(verts * verts, axis=-1)
    )
    w_pad = jnp.zeros((Vp, Jp), jnp.float32).at[:V, :J].set(skin_weights)

    grid = (Pp // T,)
    out_w, out_d = pl.pallas_call(
        functools.partial(_knn_kernel, K=K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, Jp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, Jp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, Jp), jnp.float32),
            jax.ShapeDtypeStruct((Pp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(pts_pad, verts_pad, vsq, w_pad)
    return out_w[:P, :J], out_d[:P, 0] > max_dist


def knn_blend_weights_pallas(pts, verts, skin_weights, K=15, max_dist=0.1,
                             interpret=False):
    # the KNN blend is non-differentiable by contract (the reference detaches
    # it, deformer.py:101); cutting the gradient at the *inputs* also keeps
    # autodiff from ever trying to linearize through the pallas_call, which
    # has no JVP rule
    pts = jax.lax.stop_gradient(pts)
    verts = jax.lax.stop_gradient(verts)
    skin_weights = jax.lax.stop_gradient(skin_weights)

    def one(p, v, w):
        return _knn_pallas_single(p, v, w, K, max_dist, interpret)

    weights, outlier = jax.vmap(one)(pts, verts, skin_weights)
    return weights, outlier


def knn_blend_weights(pts, verts, skin_weights, K=15, max_dist=0.1):
    """Platform dispatch: fused Pallas kernel on TPU, XLA fallback elsewhere."""
    platform = jax.devices()[0].platform
    if platform == "tpu":
        return knn_blend_weights_pallas(pts, verts, skin_weights, K, max_dist)
    return knn_blend_weights_xla(pts, verts, skin_weights, K, max_dist)


# --------------------------------------------------------------------------
# Transposed (points-minor) kernel
# --------------------------------------------------------------------------
#
# The straight kernel emits weights as (P, Jp) with J=16 padded to 128 lanes
# — 8x write amplification — and every consumer (skinning, Jacobians) then
# runs per-point small-matrix math on (..., 3, 3)/(4, 4) arrays whose minor
# dims tile to (8, 128) with ~40x padding waste (traced at ~50 ms/step).
# Keeping the POINT axis minor fixes both: weights come out (J, P) —
# J=16 rides the sublane dim exactly — and all downstream per-point algebra
# runs on (B, P) slices at full lane utilisation (see skinning_t below).

def _knn_kernel_t(pts_ref, verts_ref, vsq_ref, psq_ref, w_ref,
                  out_w_ref, out_d_ref, *, K):
    """Transposed tile: distances as (Vp, T), weights emitted as (Jp, T).

    (A bf16 ranking loop was tried for the VPU-bound K extractions; Mosaic on
    v5e rejects bf16 vector compares — "Target does not support this
    comparison" — so ranking stays f32.)"""
    pts = pts_ref[:]  # (T, 8) xyz padded
    verts = verts_ref[:]  # (Vp, 8)
    vsq = vsq_ref[:]  # (Vp, 1), +big on padding
    psq = psq_ref[:]  # (1, T)
    cross = jax.lax.dot_general(
        verts, pts, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Vp, T)
    d2 = jnp.maximum(vsq + psq - 2.0 * cross, 0.0)
    d2c = jnp.minimum(d2, _CLAMP)

    first_min = jnp.min(d2, axis=0, keepdims=True)  # (1, T)
    kth = kth_smallest(d2, K, axis=0)

    mask = d2 <= kth
    conf = jnp.where(mask, jnp.exp(-d2c), 0.0)
    conf = conf / jnp.sum(conf, axis=0, keepdims=True)
    out_w_ref[:] = jax.lax.dot_general(
        w_ref[:], conf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Jp, T)
    out_d_ref[:] = jnp.sqrt(jnp.minimum(first_min, _CLAMP))


@functools.partial(jax.jit, static_argnames=("K", "max_dist", "interpret"))
def _knn_pallas_single_t(pts, verts, skin_weights, K, max_dist,
                         interpret=False):
    """(P,3),(V,3),(V,J) -> ((J,P), (P,))"""
    P, V, J = pts.shape[0], verts.shape[0], skin_weights.shape[1]
    T = 512
    Pp = _round_up(P, T)
    Vp = _round_up(V, 128)
    Jp = _round_up(J, 8)  # sublane dim now — 16 fits exactly

    pts_pad = jnp.zeros((Pp, 8), jnp.float32).at[:P, :3].set(pts)
    verts_pad = jnp.zeros((Vp, 8), jnp.float32).at[:V, :3].set(verts)
    vsq = jnp.full((Vp, 1), 1e9, jnp.float32).at[:V, 0].set(
        jnp.sum(verts * verts, axis=-1)
    )
    psq = jnp.zeros((1, Pp), jnp.float32).at[0, :P].set(
        jnp.sum(pts * pts, axis=-1)
    )
    w_pad = jnp.zeros((Vp, Jp), jnp.float32).at[:V, :J].set(skin_weights)

    grid = (Pp // T,)
    out_w, out_d = pl.pallas_call(
        functools.partial(_knn_kernel_t, K=K),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, Jp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Jp, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Jp, Pp), jnp.float32),
            jax.ShapeDtypeStruct((1, Pp), jnp.float32),
        ],
        interpret=interpret,
    )(pts_pad, verts_pad, vsq, psq, w_pad)
    return out_w[:J, :P], out_d[0, :P] > max_dist


def knn_blend_weights_t(pts, verts, skin_weights, K=15, max_dist=0.1,
                        interpret=False):
    """Points-minor variant: returns (weights (B,J,P), outlier (B,P)).

    Same contract as knn_blend_weights (stop-gradient weights); TPU runs the
    transposed Pallas kernel, other platforms transpose the XLA fallback."""
    platform = jax.devices()[0].platform
    if platform == "tpu" or interpret:
        pts = jax.lax.stop_gradient(pts)
        verts = jax.lax.stop_gradient(verts)
        skin_weights = jax.lax.stop_gradient(skin_weights)

        def one(p, v, w):
            return _knn_pallas_single_t(p, v, w, K, max_dist, interpret)

        return jax.vmap(one)(pts, verts, skin_weights)
    w, outlier = knn_blend_weights_xla(pts, verts, skin_weights, K, max_dist)
    return jnp.swapaxes(w, 1, 2), outlier


# --------------------------------------------------------------------------
# LBS warps
# --------------------------------------------------------------------------

def skinning(x: jnp.ndarray, w: jnp.ndarray, tfs: jnp.ndarray,
             inverse: bool = False) -> jnp.ndarray:
    """Blend-skin points. x (B,P,3), w (B,P,J), tfs (B,J,4,4).

    Forward: x_d = (sum_j w_j T_j) x.  Inverse: x_c = (sum_j w_j T_j)^-1 x,
    via the closed-form affine inverse (the reference inverts dense 4x4s at
    deformer.py:166; the affine form is cheaper and exact).
    """
    w_tf = jnp.einsum("bpj,bjmn->bpmn", w, tfs)
    if inverse:
        w_tf = inverse_affine4(w_tf)
    return (
        jnp.einsum("bpmn,bpn->bpm", w_tf[..., :3, :3], x) + w_tf[..., :3, 3]
    )


def skinning_jacobian(w: jnp.ndarray, tfs: jnp.ndarray) -> jnp.ndarray:
    """d(forward_skin)/dx with stop-gradient weights: J = sum_j w_j R_j.

    This is exactly what the reference's three autograd passes compute at
    code/src/engine/volsdf_utils.py:66-80, because the KNN weights are
    detached; here it is a single einsum. (B,P,J),(B,J,4,4)->(B,P,3,3)."""
    return jnp.einsum("bpj,bjmn->bpmn", w, tfs[..., :3, :3])


# --------------------------------------------------------------------------
# Fused sampler warp: KNN + weight blend + inverse-LBS in ONE kernel
# --------------------------------------------------------------------------
#
# The sampler's deformed->canonical warp is stop-gradient (z tables carry no
# grad), so it can run as a single non-differentiable Pallas kernel: the
# (Vp, T) distance tile, the blended weights, the 12 affine planes, and the
# adjugate inverse all stay in VMEM.  This removes the XLA-side per-point
# affine algebra whose layouts kept degenerating (every orientation of a
# sliced component axis was materialized on the 128-lane dim).

def _xyz_rows(pts):
    """(T, 8) point tile -> ((3, T) xyz rows, (1, T) squared norms).

    The row extraction is a tiny selector dot (avoids an in-kernel
    transpose), and computing |p|^2 here saves the caller a full-width
    reduce + pad per kernel launch (traced at ~3 ms each at 10k rays)."""
    sel = jax.lax.broadcasted_iota(jnp.int32, (3, 8), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (3, 8), 1)
    E3 = (sel == col).astype(jnp.float32)
    xyz = jax.lax.dot_general(
        E3, pts, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    psq = (
        xyz[0:1] * xyz[0:1] + xyz[1:2] * xyz[1:2] + xyz[2:3] * xyz[2:3]
    )
    return xyz, psq


def _knn_warp_kernel(pts_ref, verts_ref, vsq_ref, w_ref, tf_ref,
                     out_ref, *, K):
    pts = pts_ref[:]  # (T, 8) xyz padded
    verts = verts_ref[:]  # (Vp, 8)
    xyz, psq = _xyz_rows(pts)
    cross = jax.lax.dot_general(
        verts, pts, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Vp, T)
    d2 = jnp.maximum(vsq_ref[:] + psq - 2.0 * cross, 0.0)
    d2c = jnp.minimum(d2, _CLAMP)

    first_min = jnp.min(d2, axis=0, keepdims=True)  # (1, T)
    kth = kth_smallest(d2, K, axis=0)
    conf = jnp.where(d2 <= kth, jnp.exp(-d2c), 0.0)
    conf = conf / jnp.sum(conf, axis=0, keepdims=True)

    wb = jax.lax.dot_general(
        w_ref[:], conf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Jp, T) blended skinning weights
    A = jax.lax.dot_general(
        tf_ref[:], wb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16, T): rows c = 4*i + m of sum_j w_j T_j (last 4 rows unused)

    r = [A[4 * i + m : 4 * i + m + 1] for i in range(3) for m in range(3)]
    t = [A[4 * i + 3 : 4 * i + 4] for i in range(3)]
    inv = _inv3_planes(r)
    diff = [xyz[m : m + 1] - t[m] for m in range(3)]
    xc = [
        sum(inv[3 * i + m] * diff[m] for m in range(3)) for i in range(3)
    ]  # 3 x (1, T)

    dist = jnp.sqrt(jnp.minimum(first_min, _CLAMP))
    zero = jnp.zeros_like(dist)
    out_ref[:] = jnp.concatenate(
        xc + [dist, zero, zero, zero, zero], axis=0
    )  # (8, T)


@functools.partial(jax.jit, static_argnames=("K", "max_dist", "interpret"))
def _knn_warp_single(pts, verts, skin_weights, tfs, K, max_dist,
                     interpret=False):
    """(P,3),(V,3),(V,J),(J,4,4) -> (x_c (P,3), outlier (P,))."""
    P, V, J = pts.shape[0], verts.shape[0], skin_weights.shape[1]
    T = 512
    Pp = _round_up(P, T)
    Vp = _round_up(V, 128)
    Jp = _round_up(J, 8)

    pts_pad = jnp.zeros((Pp, 8), jnp.float32).at[:P, :3].set(pts)
    verts_pad = jnp.zeros((Vp, 8), jnp.float32).at[:V, :3].set(verts)
    vsq = jnp.full((Vp, 1), 1e9, jnp.float32).at[:V, 0].set(
        jnp.sum(verts * verts, axis=-1)
    )
    w_pad = jnp.zeros((Vp, Jp), jnp.float32).at[:V, :J].set(skin_weights)
    # (16, Jp): row c = tfs[:, c//4, c%4]
    tf16 = jnp.zeros((16, Jp), jnp.float32).at[:, :J].set(
        tfs.reshape(J, 16).T
    )

    out = pl.pallas_call(
        functools.partial(_knn_warp_kernel, K=K),
        grid=(Pp // T,),
        in_specs=[
            pl.BlockSpec((T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, Jp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, Jp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Pp), jnp.float32),
        interpret=interpret,
    )(pts_pad, verts_pad, vsq, w_pad, tf16)
    x_c = jnp.swapaxes(out[:3, :P], 0, 1)
    return x_c, out[3, :P] > max_dist


def knn_inverse_warp(pts, verts, skin_weights, tfs, K=15, max_dist=0.1,
                     interpret=False):
    """Fused deformed->canonical warp for the sampler (stop-gradient path).

    pts (B,P,3), verts (B,V,3), skin_weights (B,V,J), tfs (B,J,4,4) ->
    (x_c (B,P,3), outlier (B,P)).  TPU: one fused Pallas kernel per batch
    element; elsewhere: the XLA KNN + skinning composition."""
    if jax.devices()[0].platform == "tpu" or interpret:
        pts = jax.lax.stop_gradient(pts)
        verts = jax.lax.stop_gradient(verts)
        skin_weights = jax.lax.stop_gradient(skin_weights)
        tfs = jax.lax.stop_gradient(tfs)

        def one(p, v, w, tf):
            return _knn_warp_single(p, v, w, tf, K, max_dist, interpret)

        return jax.vmap(one)(pts, verts, skin_weights, tfs)
    w, outlier = knn_blend_weights_xla(pts, verts, skin_weights, K, max_dist)
    return skinning(pts, w, tfs, inverse=True), outlier


# --------------------------------------------------------------------------
# Differentiable fused warp (main forward): custom VJP, backward in Pallas
# --------------------------------------------------------------------------
#
# The grad-stage warp needs gradients w.r.t. pts and tfs (pose learning), but
# NOT w.r.t. the KNN weights (detached by contract, deformer.py:101).  That
# makes the VJP closed-form:
#   x_c = A^{-1}(x - t),  A = sum_j w_j R_j,  t = sum_j w_j t_j
#   u       = A^{-T} g            (= dL/dx)
#   dL/dA   = -u x_c^T,  dL/dt = -u
#   dL/dtfs = sum_points w_blend (x) [dL/dA | dL/dt]   (one MXU contraction)
# Both directions run as Pallas kernels, so the per-point 3x3 algebra never
# materializes XLA-side (where every layout choice degenerated to 128-lane
# padded singletons, ~95 ms/step at 10k rays).

def _warp_fwd_kernel(pts_ref, verts_ref, vsq_ref, w_ref, tf_ref,
                     out_ref, res_ref, wb_ref, *, K):
    pts = pts_ref[:]
    verts = verts_ref[:]
    xyz, psq = _xyz_rows(pts)
    cross = jax.lax.dot_general(
        verts, pts, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    d2 = jnp.maximum(vsq_ref[:] + psq - 2.0 * cross, 0.0)
    d2c = jnp.minimum(d2, _CLAMP)
    first_min = jnp.min(d2, axis=0, keepdims=True)
    kth = kth_smallest(d2, K, axis=0)
    conf = jnp.where(d2 <= kth, jnp.exp(-d2c), 0.0)
    conf = conf / jnp.sum(conf, axis=0, keepdims=True)
    wb = jax.lax.dot_general(
        w_ref[:], conf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Jp, T)
    A = jax.lax.dot_general(
        tf_ref[:], wb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16, T)
    r = [A[4 * i + m : 4 * i + m + 1] for i in range(3) for m in range(3)]
    t = [A[4 * i + 3 : 4 * i + 4] for i in range(3)]
    inv = _inv3_planes(r)
    diff = [xyz[m : m + 1] - t[m] for m in range(3)]
    xc = [sum(inv[3 * i + m] * diff[m] for m in range(3)) for i in range(3)]
    dist = jnp.sqrt(jnp.minimum(first_min, _CLAMP))
    zero = jnp.zeros_like(dist)
    out_ref[:] = jnp.concatenate(xc + [dist, zero, zero, zero, zero], axis=0)
    res_ref[:] = jnp.concatenate(inv + t + [zero] * 4, axis=0)  # (16, T)
    wb_ref[:] = wb


def _warp_bwd_kernel(g_ref, res_ref, xc_ref, wb_ref, dpts_ref, dtf_ref):
    i = pl.program_id(0)
    g = [g_ref[m : m + 1] for m in range(3)]  # cotangent rows of x_c
    inv = [res_ref[c : c + 1] for c in range(9)]
    xc = [xc_ref[m : m + 1] for m in range(3)]
    # u = A^{-T} g : u_i = sum_j Ainv[3j+i] g_j
    u = [sum(inv[3 * j + i] * g[j] for j in range(3)) for i in range(3)]
    zero = jnp.zeros_like(u[0])
    dpts_ref[:] = jnp.concatenate(u + [zero] * 5, axis=0)  # (8, T)
    # G rows (16, T): c = 4*i + m -> dL/dA_im = -u_i xc_m ; c = 4*i+3 -> -u_i
    G_rows = []
    for i3 in range(3):
        for m in range(3):
            G_rows.append(-u[i3] * xc[m])
        G_rows.append(-u[i3])
    G = jnp.concatenate(G_rows + [zero] * 4, axis=0)  # (16, T)
    dtf = jax.lax.dot_general(
        G, wb_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16, Jp)

    @pl.when(i == 0)
    def _init():
        dtf_ref[:] = dtf

    @pl.when(i > 0)
    def _acc():
        dtf_ref[:] = dtf_ref[:] + dtf


def _warp_diff_fwd_single(pts, verts, skin_weights, tfs, K, max_dist,
                          interpret=False):
    P, V, J = pts.shape[0], verts.shape[0], skin_weights.shape[1]
    T = 512
    Pp, Vp, Jp = _round_up(P, T), _round_up(V, 128), _round_up(J, 8)
    pts_pad = jnp.zeros((Pp, 8), jnp.float32).at[:P, :3].set(pts)
    verts_pad = jnp.zeros((Vp, 8), jnp.float32).at[:V, :3].set(verts)
    vsq = jnp.full((Vp, 1), 1e9, jnp.float32).at[:V, 0].set(
        jnp.sum(verts * verts, axis=-1))
    w_pad = jnp.zeros((Vp, Jp), jnp.float32).at[:V, :J].set(skin_weights)
    tf16 = jnp.zeros((16, Jp), jnp.float32).at[:, :J].set(tfs.reshape(J, 16).T)

    out, res, wb = pl.pallas_call(
        functools.partial(_warp_fwd_kernel, K=K),
        grid=(Pp // T,),
        in_specs=[
            pl.BlockSpec((T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, Jp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, Jp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Pp), jnp.float32),
            jax.ShapeDtypeStruct((16, Pp), jnp.float32),
            jax.ShapeDtypeStruct((16, Pp), jnp.float32),
        ],
        interpret=interpret,
    )(pts_pad, verts_pad, vsq, w_pad, tf16)
    x_c = jnp.swapaxes(out[:3, :P], 0, 1)
    return (x_c, out[3, :P]), (out, res, wb)


def _warp_diff_bwd_single(residuals, g_xc, J, interpret=False):
    out, res, wb = residuals
    Pp = out.shape[1]
    P = g_xc.shape[0]
    T = 512
    Jp = wb.shape[0]
    g8 = jnp.zeros((8, Pp), jnp.float32).at[:3, :P].set(
        jnp.swapaxes(g_xc, 0, 1))
    dpts8, dtf = pl.pallas_call(
        _warp_bwd_kernel,
        grid=(Pp // T,),
        in_specs=[
            pl.BlockSpec((8, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, Jp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, Pp), jnp.float32),
            jax.ShapeDtypeStruct((16, Jp), jnp.float32),
        ],
        interpret=interpret,
    )(g8, res, out, wb)
    dpts = jnp.swapaxes(dpts8[:3, :P], 0, 1)  # (P, 3)
    # rows c = 4*i + m -> dtfs[j, i, m]; bottom row of each 4x4 gets zero
    dtfs = jnp.zeros((J, 4, 4), jnp.float32).at[:, :3, :].set(
        jnp.swapaxes(dtf[:12, :J], 0, 1).reshape(J, 3, 4)
    )
    return dpts, dtfs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _knn_warp_diff_single(pts, verts, skin_weights, tfs, K, max_dist,
                          interpret=False):
    (x_c, dist), _ = _warp_diff_fwd_single(
        pts, verts, skin_weights, tfs, K, max_dist, interpret)
    return x_c, dist > max_dist


def _knn_warp_diff_fwd(pts, verts, skin_weights, tfs, K, max_dist,
                       interpret=False):
    (x_c, dist), residuals = _warp_diff_fwd_single(
        pts, verts, skin_weights, tfs, K, max_dist, interpret)
    return (x_c, dist > max_dist), (residuals, verts, skin_weights)


def _knn_warp_diff_bwd(K, max_dist, interpret, saved, cots):
    residuals, verts, skin_weights = saved
    g_xc, _ = cots  # outlier mask carries no tangent
    J = skin_weights.shape[1]
    dpts, dtfs = _warp_diff_bwd_single(residuals, g_xc, J, interpret)
    # verts / skin weights are detached by contract
    return dpts, jnp.zeros_like(verts), jnp.zeros_like(skin_weights), dtfs


_knn_warp_diff_single.defvjp(_knn_warp_diff_fwd, _knn_warp_diff_bwd)


def knn_inverse_warp_diff(pts, verts, skin_weights, tfs, K=15, max_dist=0.1,
                          interpret=False):
    """Differentiable fused warp for the main forward.

    Same math as knn_inverse_warp, but with a closed-form custom VJP (also a
    Pallas kernel) providing gradients w.r.t. ``pts`` and ``tfs``; ``verts``
    and ``skin_weights`` are stop-gradient by the KNN detach contract."""
    if jax.devices()[0].platform == "tpu" or interpret:
        verts = jax.lax.stop_gradient(verts)
        skin_weights = jax.lax.stop_gradient(skin_weights)

        def one(p, v, w, tf):
            return _knn_warp_diff_single(p, v, w, tf, K, max_dist, interpret)

        return jax.vmap(one)(pts, verts, skin_weights, tfs)
    w, outlier = knn_blend_weights_xla(pts, verts, skin_weights, K, max_dist)
    return skinning(pts, w, tfs, inverse=True), outlier


# --------------------------------------------------------------------------
# Fused Jacobian-inverse (main forward): J^{-1} = (sum_j w_j R_j)^{-1}
# --------------------------------------------------------------------------
#
# The shading normal transform needs the inverse forward-skinning Jacobian at
# each canonical point, with KNN weights queried against the CANONICAL verts
# (deformer.py:70-82).  Weights are detached, so the only gradient path is
# tfs: d(A^{-1}) = -A^{-1} dA A^{-1}  =>  dL/dA = -A^{-T} G A^{-T},
# dL/dtfs_rot = sum_points w_blend (x) dL/dA.

def _jinv_fwd_kernel(pts_ref, verts_ref, vsq_ref, w_ref, tf_ref,
                     out_ref, wb_ref, *, K):
    pts = pts_ref[:]
    verts = verts_ref[:]
    _, psq = _xyz_rows(pts)
    cross = jax.lax.dot_general(
        verts, pts, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    d2 = jnp.maximum(vsq_ref[:] + psq - 2.0 * cross, 0.0)
    d2c = jnp.minimum(d2, _CLAMP)
    kth = kth_smallest(d2, K, axis=0)
    conf = jnp.where(d2 <= kth, jnp.exp(-d2c), 0.0)
    conf = conf / jnp.sum(conf, axis=0, keepdims=True)
    wb = jax.lax.dot_general(
        w_ref[:], conf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    A = jax.lax.dot_general(
        tf_ref[:], wb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16, T): rows c = 3*i + m hold R_im (9 used)
    r = [A[3 * i + m : 3 * i + m + 1] for i in range(3) for m in range(3)]
    inv = _inv3_planes(r)
    zero = jnp.zeros_like(inv[0])
    out_ref[:] = jnp.concatenate(inv + [zero] * 7, axis=0)  # (16, T)
    wb_ref[:] = wb


def _jinv_bwd_kernel(g_ref, inv_ref, wb_ref, dtf_ref):
    i = pl.program_id(0)
    G = [g_ref[c : c + 1] for c in range(9)]
    inv = [inv_ref[c : c + 1] for c in range(9)]
    # dL/dA = -A^{-T} G A^{-T}:  P_ik = sum_j inv[3j+i] G[3j+k];
    # out_im = -sum_k P_ik inv[3m+k]
    Pik = [
        sum(inv[3 * j + i] * G[3 * j + k] for j in range(3))
        for i in range(3) for k in range(3)
    ]
    rows = []
    for i3 in range(3):
        for m in range(3):
            rows.append(
                -sum(Pik[3 * i3 + k] * inv[3 * m + k] for k in range(3))
            )
    zero = jnp.zeros_like(rows[0])
    dA = jnp.concatenate(rows + [zero] * 7, axis=0)  # (16, T)
    dtf = jax.lax.dot_general(
        dA, wb_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16, Jp)

    @pl.when(i == 0)
    def _init():
        dtf_ref[:] = dtf

    @pl.when(i > 0)
    def _acc():
        dtf_ref[:] = dtf_ref[:] + dtf


def _jinv_fwd_single(pts, verts, skin_weights, tfs, K, interpret=False):
    P, V, J = pts.shape[0], verts.shape[0], skin_weights.shape[1]
    T = 512
    Pp, Vp, Jp = _round_up(P, T), _round_up(V, 128), _round_up(J, 8)
    pts_pad = jnp.zeros((Pp, 8), jnp.float32).at[:P, :3].set(pts)
    verts_pad = jnp.zeros((Vp, 8), jnp.float32).at[:V, :3].set(verts)
    vsq = jnp.full((Vp, 1), 1e9, jnp.float32).at[:V, 0].set(
        jnp.sum(verts * verts, axis=-1))
    w_pad = jnp.zeros((Vp, Jp), jnp.float32).at[:V, :J].set(skin_weights)
    # rows c = 3*i + m hold R[:, i, m]
    tf9 = jnp.zeros((16, Jp), jnp.float32).at[:9, :J].set(
        tfs[:, :3, :3].reshape(J, 9).T)

    out, wb = pl.pallas_call(
        functools.partial(_jinv_fwd_kernel, K=K),
        grid=(Pp // T,),
        in_specs=[
            pl.BlockSpec((T, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, Jp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, Jp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, Pp), jnp.float32),
            jax.ShapeDtypeStruct((16, Pp), jnp.float32),
        ],
        interpret=interpret,
    )(pts_pad, verts_pad, vsq, w_pad, tf9)
    jinv9 = jnp.swapaxes(out[:9, :P], 0, 1)  # (P, 9) row-major
    return jinv9, (out, wb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _knn_jinv_single(pts, verts, skin_weights, tfs, K, interpret=False):
    jinv9, _ = _jinv_fwd_single(pts, verts, skin_weights, tfs, K, interpret)
    return jinv9


def _knn_jinv_fwd(pts, verts, skin_weights, tfs, K, interpret=False):
    jinv9, res = _jinv_fwd_single(pts, verts, skin_weights, tfs, K, interpret)
    return jinv9, (res, pts, verts, skin_weights)


def _knn_jinv_bwd(K, interpret, saved, g):
    (out, wb), pts, verts, skin_weights = saved
    Pp = out.shape[1]
    P = g.shape[0]
    T = 512
    Jp = wb.shape[0]
    J = skin_weights.shape[1]
    g16 = jnp.zeros((16, Pp), jnp.float32).at[:9, :P].set(
        jnp.swapaxes(g, 0, 1))
    dtf = pl.pallas_call(
        _jinv_bwd_kernel,
        grid=(Pp // T,),
        in_specs=[
            pl.BlockSpec((16, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, Jp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, Jp), jnp.float32),
        interpret=interpret,
    )(g16, out, wb)
    dtfs = jnp.zeros((J, 4, 4), jnp.float32).at[:, :3, :3].set(
        jnp.swapaxes(dtf[:9, :J], 0, 1).reshape(J, 3, 3)
    )
    return (jnp.zeros_like(pts), jnp.zeros_like(verts),
            jnp.zeros_like(skin_weights), dtfs)


_knn_jinv_single.defvjp(_knn_jinv_fwd, _knn_jinv_bwd)


def knn_jacobian_inverse(pts_c, verts_c, skin_weights, tfs, K=15,
                         interpret=False):
    """(B,P,3),(B,V,3),(B,V,J),(B,J,4,4) -> (B,P,9) row-major J^{-1}.

    TPU: fused Pallas forward + closed-form Pallas VJP (gradient w.r.t. tfs
    rotations only — weights and query points are detached by contract).
    Elsewhere: XLA composition."""
    if jax.devices()[0].platform == "tpu" or interpret:
        pts_c = jax.lax.stop_gradient(pts_c)
        verts_c = jax.lax.stop_gradient(verts_c)
        skin_weights = jax.lax.stop_gradient(skin_weights)

        def one(p, v, w, tf):
            return _knn_jinv_single(p, v, w, tf, K, interpret)

        return jax.vmap(one)(pts_c, verts_c, skin_weights, tfs)
    from ..utils.transforms import inverse_mat3

    w, _ = knn_blend_weights_xla(pts_c, verts_c, skin_weights, K)
    B, P = pts_c.shape[:2]
    return inverse_mat3(
        skinning_jacobian(w, tfs).reshape(-1, 3, 3)
    ).reshape(B, P, 9)


# --------------------------------------------------------------------------
# Points-minor LBS warps
# --------------------------------------------------------------------------
#
# Same math as skinning/skinning_jacobian, but every per-point quantity keeps
# the POINT axis as the minor (lane) dimension: blended transforms live as 12
# (B, P) planes instead of (B, P, 4, 4) arrays whose (4, 4) tails tile to
# (8, 128) with massive padding.  The blend itself becomes one MXU matmul
# (M=12, K=J, N=P) and the affine inverse ~30 full-lane VPU ops.

def _blend_tfs_t(w_t: jnp.ndarray, tfs: jnp.ndarray) -> list:
    """(B,J,P),(B,J,4,4) -> 12 planes (B,P): rows of sum_j w_j T_j, c=4*i+m.

    Each plane is its OWN batched matvec dot — never a slice of a packed
    (12, B, P) array.  Slicing a component axis of any size-12 tensor made
    XLA lay the sliced singleton on the 128-lane dim (~5.6 ms per plane
    fusion at bench shapes, whichever axis order was used); independent
    (B, P) dots get clean full-lane layouts.  The 12x re-read of w_t is
    ~0.4 ms of HBM — an order of magnitude cheaper."""
    flat = tfs[..., :3, :].reshape(tfs.shape[0], tfs.shape[1], 12)
    return [
        jax.lax.dot_general(
            flat[:, :, c], w_t, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        for c in range(12)
    ]


def _inv3_planes(m):
    """Adjugate inverse of a 3x3 given as 9 (B,P) planes (row-major list)."""
    a, b, c, d, e, f, g, h, i = m
    A = e * i - f * h
    B_ = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B_ + c * C
    inv_det = 1.0 / jnp.where(
        jnp.abs(det) < 1e-12, jnp.sign(det) * 1e-12 + 1e-20, det
    )
    adj = [
        A, -(b * i - c * h), (b * f - c * e),
        B_, (a * i - c * g), -(a * f - c * d),
        C, -(a * h - b * g), (a * e - b * d),
    ]
    return [x * inv_det for x in adj]


def skinning_t(x: jnp.ndarray, w_t: jnp.ndarray, tfs: jnp.ndarray,
               inverse: bool = False) -> jnp.ndarray:
    """Blend-skin points, points-minor internals. x (B,P,3), w_t (B,J,P),
    tfs (B,J,4,4) -> (B,P,3).  Matches skinning() with w = w_t^T."""
    A = _blend_tfs_t(w_t, tfs)  # 12 planes (B, P)
    R = [A[4 * i + m] for i in range(3) for m in range(3)]  # 9 x (B, P)
    t = [A[4 * i + 3] for i in range(3)]
    xs = [x[..., m] for m in range(3)]
    if inverse:
        Rinv = _inv3_planes(R)
        diff = [xs[m] - t[m] for m in range(3)]
        ys = [
            sum(Rinv[3 * i + m] * diff[m] for m in range(3)) for i in range(3)
        ]
    else:
        ys = [
            sum(R[3 * i + m] * xs[m] for m in range(3)) + t[i]
            for i in range(3)
        ]
    return jnp.stack(ys, axis=-1)  # (B, P, 3)


def skinning_jacobian_inv_t(w_t: jnp.ndarray, tfs: jnp.ndarray) -> jnp.ndarray:
    """(sum_j w_j R_j)^-1 as (B,P,9) row-major — the inverse forward-skinning
    Jacobian consumed by the shading normal transform.  Points-minor algebra,
    transposed once at the end for the (N, 9) chunked shading input."""
    A = _blend_tfs_t(w_t, tfs)  # 12 planes (B, P)
    R = [A[4 * i + m] for i in range(3) for m in range(3)]
    Rinv = _inv3_planes(R)  # 9 x (B, P)
    return jnp.stack(Rinv, axis=-1)  # (B, P, 9)
