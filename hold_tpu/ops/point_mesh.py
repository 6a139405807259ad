"""Point-to-triangle-mesh signed distance in pure JAX.

TPU-native replacement for the kaolin CUDA ops the reference leans on
(point_to_mesh_distance + check_sign at code/src/engine/volsdf_utils.py:172-217):
brute-force point-triangle distances (the meshes involved are small: sealed
subdivided MANO ~6k faces, object cano mesh <=16k faces) and a generalized
winding number for the inside/outside sign — robust to open boundaries and
fully data-parallel, unlike ray-casting sign tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def triangle_sqdist(p: jnp.ndarray, v0, v1, v2) -> jnp.ndarray:
    """Squared distance from points to triangles, fully broadcast.

    p: (..., 3); v0/v1/v2: (..., 3) broadcastable against p.
    Classic Ericson region decomposition expressed with jnp.where.
    """
    ab = v1 - v0
    ac = v2 - v0
    ap = p - v0

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - v1
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - v2
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_bc = jnp.maximum((d4 - d3) + (d5 - d6), _EPS)
    w_bc = jnp.clip((d4 - d3) / denom_bc, 0.0, 1.0)

    v_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) < _EPS, _EPS, d1 - d3), 0.0, 1.0)
    w_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) < _EPS, _EPS, d2 - d6), 0.0, 1.0)

    denom_in = jnp.maximum(va + vb + vc, _EPS)
    v_in = vb / denom_in
    w_in = vc / denom_in

    # region masks
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (~in_a) & (~in_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (~in_a) & (~in_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (~in_b) & (~in_c) & (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    # closest point candidates
    c_a = v0
    c_b = v1
    c_c = v2
    c_ab = v0 + v_ab[..., None] * ab
    c_ac = v0 + w_ac[..., None] * ac
    c_bc = v1 + w_bc[..., None] * (v2 - v1)
    c_in = v0 + v_in[..., None] * ab + w_in[..., None] * ac

    closest = c_in
    closest = jnp.where(on_bc[..., None], c_bc, closest)
    closest = jnp.where(on_ac[..., None], c_ac, closest)
    closest = jnp.where(on_ab[..., None], c_ab, closest)
    closest = jnp.where(in_c[..., None], c_c, closest)
    closest = jnp.where(in_b[..., None], c_b, closest)
    closest = jnp.where(in_a[..., None], c_a, closest)

    diff = p - closest
    return jnp.sum(diff * diff, -1)


def point_mesh_sqdist(
    pts: jnp.ndarray,  # (P, 3)
    tri_verts: jnp.ndarray,  # (F, 3, 3)
    chunk: int = 0,
) -> jnp.ndarray:
    """(P,) min squared distance over all faces.

    ``chunk`` > 0 scans over point chunks to bound the (P, F) intermediate.
    """

    def block(p):
        d = triangle_sqdist(
            p[:, None, :], tri_verts[None, :, 0], tri_verts[None, :, 1],
            tri_verts[None, :, 2],
        )
        return jnp.min(d, axis=-1)

    if chunk and pts.shape[0] > chunk:
        P = pts.shape[0]
        pad = (-P) % chunk
        pts_p = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)])
        out = jax.lax.map(block, pts_p.reshape(-1, chunk, 3))
        return out.reshape(-1)[:P]
    return block(pts)


def winding_number(pts: jnp.ndarray, tri_verts: jnp.ndarray,
                   chunk: int = 0) -> jnp.ndarray:
    """Generalized winding number (Barill et al. solid-angle sum), (P,).

    ~0 outside, ~1 inside (for closed meshes)."""

    def block(p):
        a = tri_verts[None, :, 0] - p[:, None, :]
        b = tri_verts[None, :, 1] - p[:, None, :]
        c = tri_verts[None, :, 2] - p[:, None, :]
        la = jnp.linalg.norm(a, axis=-1)
        lb = jnp.linalg.norm(b, axis=-1)
        lc = jnp.linalg.norm(c, axis=-1)
        det = jnp.sum(a * jnp.cross(b, c), axis=-1)
        denom = (
            la * lb * lc
            + jnp.sum(a * b, -1) * lc
            + jnp.sum(b * c, -1) * la
            + jnp.sum(c * a, -1) * lb
        )
        omega = 2.0 * jnp.arctan2(det, denom)
        return jnp.sum(omega, axis=-1) / (4.0 * jnp.pi)

    if chunk and pts.shape[0] > chunk:
        P = pts.shape[0]
        pad = (-P) % chunk
        pts_p = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)])
        out = jax.lax.map(block, pts_p.reshape(-1, chunk, 3))
        return out.reshape(-1)[:P]
    return block(pts)


def signed_distance_to_mesh(
    pts: jnp.ndarray,  # (P, 3)
    verts: jnp.ndarray,  # (V, 3)
    faces: jnp.ndarray,  # (F, 3) int
    chunk: int = 0,
) -> jnp.ndarray:
    """SDF of points to a triangle mesh: negative inside (winding > 0.5).

    Same sign convention as the reference's kaolin pipeline
    (volsdf_utils.py:180-186)."""
    tri = verts[faces]  # (F, 3, 3)
    dist = jnp.sqrt(jnp.maximum(point_mesh_sqdist(pts, tri, chunk=chunk), 0.0))
    wn = winding_number(pts, tri, chunk=chunk)
    sign = jnp.where(wn > 0.5, -1.0, 1.0)
    return sign * dist


def check_off_in_surface(
    signed_dist: jnp.ndarray,  # (P,) flat sdf of all ray samples
    num_rays: int,
    threshold: float,
):
    """Per-ray min-SDF classification (volsdf_utils.py:189-217):
    off-surface if min over the ray's samples > threshold; in-surface if <= 0."""
    sd = signed_dist.reshape(num_rays, -1)
    minimum = jnp.min(sd, axis=1)
    return minimum > threshold, minimum <= 0.0


def min_vertex_dist(pts: jnp.ndarray, verts: jnp.ndarray) -> jnp.ndarray:
    """(P,3),(V,3) -> (P,) min distance to the vertex set (one MXU matmul)."""
    p2 = jnp.sum(pts * pts, axis=-1, keepdims=True)
    v2 = jnp.sum(verts * verts, axis=-1)
    d2 = p2 + v2[None, :] - 2.0 * (pts @ verts.T)
    return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))


def _min_vdist_kernel(pts_ref, verts_ref, vsq_ref, psq_ref, out_ref):
    """One (vert-tile, point-tile) grid step; running min over vert tiles.

    Distances as (Vt, T) with the point axis minor; the cross term rides the
    MXU instead of being folded into a VPU loop fusion (which is what XLA
    does when the (P, V) matmul feeds straight into a min-reduce — traced at
    ~12 ms/step for 500k x 16k at bench shapes)."""
    import jax.experimental.pallas as pl  # local: keep module import light

    j = pl.program_id(1)
    pts = pts_ref[:]  # (T, 8)
    verts = verts_ref[:]  # (Vt, 8)
    cross = jax.lax.dot_general(
        verts, pts, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Vt, T)
    d2 = jnp.maximum(vsq_ref[:] + psq_ref[:] - 2.0 * cross, 0.0)
    m = jnp.min(d2, axis=0, keepdims=True)  # (1, T)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = m

    @pl.when(j > 0)
    def _acc():
        out_ref[:] = jnp.minimum(out_ref[:], m)


def min_vertex_dist_pallas(pts: jnp.ndarray, verts: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Pallas version of min_vertex_dist; identical result."""
    import functools

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pts = jax.lax.stop_gradient(pts)
    verts = jax.lax.stop_gradient(verts)
    P, V = pts.shape[0], verts.shape[0]
    T, Vt = 2048, 2048
    Pp = -(-P // T) * T
    Vp = -(-V // Vt) * Vt

    pts_pad = jnp.zeros((Pp, 8), jnp.float32).at[:P, :3].set(pts)
    verts_pad = jnp.zeros((Vp, 8), jnp.float32).at[:V, :3].set(verts)
    vsq = jnp.full((Vp, 1), 1e12, jnp.float32).at[:V, 0].set(
        jnp.sum(verts * verts, axis=-1)
    )
    psq = jnp.zeros((1, Pp), jnp.float32).at[0, :P].set(
        jnp.sum(pts * pts, axis=-1)
    )

    out = pl.pallas_call(
        _min_vdist_kernel,
        grid=(Pp // T, Vp // Vt),
        in_specs=[
            pl.BlockSpec((T, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vt, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Vt, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Pp), jnp.float32),
        interpret=interpret,
    )(pts_pad, verts_pad, vsq, psq)
    return jnp.sqrt(jnp.maximum(out[0, :P], 0.0))


def min_vertex_dist_fast(pts: jnp.ndarray, verts: jnp.ndarray) -> jnp.ndarray:
    """Platform dispatch: Pallas kernel on TPU for large products."""
    if jax.devices()[0].platform == "tpu" and pts.shape[0] * verts.shape[0] > 2**22:
        return min_vertex_dist_pallas(pts, verts)
    return min_vertex_dist(pts, verts)


def off_surface_by_vertex_bound(
    pts: jnp.ndarray,  # (P,3) flat ray samples
    verts: jnp.ndarray,  # (V,3) mesh vertices
    num_rays: int,
    threshold: float,
    h_margin,  # scalar: max surface-point-to-nearest-vertex distance
) -> jnp.ndarray:
    """Conservative off-surface ray classification.

    Since d_triangle <= d_vertex <= d_triangle + h (h bounded by the max
    face circumradius), `min d_vertex > threshold + h` implies the exact
    `min signed_distance > threshold` of the reference
    (volsdf_utils.py:189-217).  Replaces a brute-force point-to-triangle +
    winding-number sweep (hundreds of ms) with one matmul (<2 ms); the only
    deviation is that rays in the (threshold, threshold+h] band are
    conservatively treated as near-surface."""
    d = min_vertex_dist_fast(pts, verts)
    per_ray = jnp.min(d.reshape(num_rays, -1), axis=1)
    return per_ray > (threshold + h_margin)


def face_circumradius_bound(verts, faces) -> jnp.ndarray:
    """max over faces of (longest edge / sqrt(3)) — a bound on the distance
    from any surface point to its nearest vertex. Works on jnp or np."""
    import jax.numpy as jnp2

    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    e = jnp2.stack([
        jnp2.linalg.norm(v1 - v0, axis=-1),
        jnp2.linalg.norm(v2 - v1, axis=-1),
        jnp2.linalg.norm(v0 - v2, axis=-1),
    ])
    return jnp2.max(e) / jnp2.sqrt(3.0)
