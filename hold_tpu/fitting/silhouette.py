"""Differentiable soft-silhouette rasterizer in pure JAX.

TPU-native replacement for the pytorch3d SoftSilhouetteShader pipeline the
reference uses for pose refinement (code/src/fitting/utils.py:101-120):
per-pixel coverage is aggregated over ALL faces in log-space,

    alpha(p) = 1 - prod_f (1 - sigmoid(s_f(p) * d_f(p)^2 / sigma)),

where d_f is the 2D point-to-triangle distance in pixels-projected space and
s_f = +1 inside / -1 outside — the same soft-aggregation as SoftRas, but
exact over every face (pytorch3d truncates to faces_per_pixel=100) and shaped
as a dense scan over face chunks so XLA keeps the (pixels x chunk) tile in
registers/VMEM instead of materialising a pixels x faces tensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_SIGMA = 1e-6  # in NDC-squared units (pytorch3d BlendParams sigma)


def project_to_ndc(verts_cam: jnp.ndarray, K: jnp.ndarray, imsize) -> jnp.ndarray:
    """Camera-space verts -> (x, y) in a square NDC where the image spans
    ~[-1, 1] on the longer side (pytorch3d screen convention scale), plus z.
    verts_cam: (B, V, 3); K: (3, 3)."""
    H, W = imsize
    z = jnp.maximum(verts_cam[..., 2:3], 1e-6)
    u = verts_cam[..., 0:1] * K[0, 0] / z[..., 0:1] + K[0, 2]
    v = verts_cam[..., 1:2] * K[1, 1] / z[..., 0:1] + K[1, 2]
    s = 2.0 / max(H, W)
    x = u * s - W * s / 2.0
    y = v * s - H * s / 2.0
    return jnp.concatenate([x, y, verts_cam[..., 2:3]], axis=-1)


def _edge_dist2(p, a, b):
    """Squared distance point->segment in 2D, broadcast."""
    ab = b - a
    t = jnp.sum((p - a) * ab, -1) / jnp.maximum(jnp.sum(ab * ab, -1), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    d = p - proj
    return jnp.sum(d * d, -1)


def _signed_tri_dist2(px, v0, v1, v2):
    """px: (..., 2); v0/1/2: (..., 2). Returns signed squared distance:
    negative inside the triangle, positive outside."""
    d2 = jnp.minimum(
        jnp.minimum(_edge_dist2(px, v0, v1), _edge_dist2(px, v1, v2)),
        _edge_dist2(px, v2, v0),
    )

    def cross(o, a, b):
        return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
            a[..., 1] - o[..., 1]
        ) * (b[..., 0] - o[..., 0])

    c0 = cross(v0, v1, px)
    c1 = cross(v1, v2, px)
    c2 = cross(v2, v0, px)
    inside = ((c0 >= 0) & (c1 >= 0) & (c2 >= 0)) | (
        (c0 <= 0) & (c1 <= 0) & (c2 <= 0)
    )
    return jnp.where(inside, -d2, d2)


@functools.partial(
    jax.jit, static_argnames=("imsize", "face_chunk")
)
def render_silhouette(
    verts_cam: jnp.ndarray,  # (B, V, 3) camera-space vertices
    faces: jnp.ndarray,  # (F, 3) int
    K: jnp.ndarray,  # (3, 3)
    imsize: tuple[int, int],
    sigma: float = DEFAULT_SIGMA,
    face_chunk: int = 64,
) -> jnp.ndarray:
    """(B, H, W) soft coverage in [0, 1]."""
    H, W = imsize
    B = verts_cam.shape[0]
    ndc = project_to_ndc(verts_cam, K, imsize)  # (B, V, 3)

    # pixel centers in the same NDC
    s = 2.0 / max(H, W)
    xs = (jnp.arange(W) + 0.5) * s - W * s / 2.0
    ys = (jnp.arange(H) + 0.5) * s - H * s / 2.0
    px = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H, W, 2)
    px = px.reshape(-1, 2)  # (HW, 2)

    F = faces.shape[0]
    pad = (-F) % face_chunk
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0
    )
    valid = jnp.concatenate(
        [jnp.ones((F,)), jnp.zeros((pad,))], axis=0
    ).reshape(-1, face_chunk)
    faces_chunks = faces_p.reshape(-1, face_chunk, 3)

    sigma = jnp.asarray(sigma, jnp.float32)

    def body(log_acc, chunk):
        fidx, vmask = chunk  # (C, 3), (C,)
        tri = ndc[:, fidx]  # (B, C, 3, 3)
        v0, v1, v2 = tri[:, :, 0], tri[:, :, 1], tri[:, :, 2]
        behind = (
            (v0[..., 2] <= 1e-6) | (v1[..., 2] <= 1e-6) | (v2[..., 2] <= 1e-6)
        )
        # (B, HW, C)
        sd2 = _signed_tri_dist2(
            px[None, :, None, :],
            v0[:, None, :, :2], v1[:, None, :, :2], v2[:, None, :, :2],
        )
        d = jax.nn.sigmoid(-sd2 / sigma)
        d = jnp.where((behind[:, None, :]) | (vmask[None, None, :] < 0.5), 0.0, d)
        log_acc = log_acc + jnp.sum(jnp.log1p(-jnp.minimum(d, 1.0 - 1e-7)), axis=-1)
        return log_acc, None

    log_acc = jnp.zeros((B, px.shape[0]))
    # remat the chunk body: the (B, HW, chunk) distance tensors would
    # otherwise be stored per scan step for the backward pass (GBs)
    log_acc, _ = jax.lax.scan(jax.checkpoint(body), log_acc, (faces_chunks, valid))
    alpha = 1.0 - jnp.exp(log_acc)
    return alpha.reshape(B, H, W)
