"""Homogeneous/rigid/projection math (JAX + numpy hosts-side helpers).

Covers the roles of the reference's ``common/transforms.py`` (rigid transforms,
2D projection, Kabsch alignment, GL<->CV MANO conversion) re-expressed for a
functional JAX pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def safe_norm(v: jnp.ndarray, axis=-1, keepdims: bool = False,
              eps: float = 1e-12) -> jnp.ndarray:
    """sqrt(sum(v^2) + eps): finite gradient at v = 0 (plain jnp.linalg.norm
    backprops sqrt'(0) = inf, which turns into NaN through any 0-cotangent
    path, e.g. gated losses or normalize-then-mask patterns)."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims) + eps)


def to_homo(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 4) with 1 appended."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def transform_points(T: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3)."""
    xh = to_homo(x)
    y = jnp.einsum("...ij,...nj->...ni", T, xh)
    return y[..., :3] / y[..., 3:4]


def rt_to_mat4(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def inverse_rigid(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid (no-shear) 4x4."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat4(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def inverse_mat3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of batched 3x3 matrices (TPU-friendly:
    avoids LU solves for the per-sample-point skinning Jacobians)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, jnp.sign(det) * 1e-12 + 1e-20, det)
    adj = jnp.stack(
        [
            A, -(b * i - c * h), (b * f - c * e),
            B, (a * i - c * g), -(a * f - c * d),
            C, -(a * h - b * g), (a * e - b * d),
        ],
        axis=-1,
    ).reshape(M.shape)
    return adj * inv_det[..., None, None]


def inverse_affine4(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a batched affine 4x4 whose last row is (0,0,0,1).

    Used for the deform->canonical inverse-LBS warp: x_c = A^-1 (x_d - t).
    Closed-form 3x3 adjugate; much faster on TPU than a general 4x4 inverse
    (the reference inverts full 4x4s at code/src/model/mano/deformer.py:166).
    """
    A = T[..., :3, :3]
    t = T[..., :3, 3]
    Ainv = inverse_mat3(A)
    return rt_to_mat4(Ainv, -jnp.einsum("...ij,...j->...i", Ainv, t))


def project2d(K: jnp.ndarray, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """Perspective projection. K (..., 3, 3), pts (..., N, 3) -> (..., N, 2)."""
    uvw = jnp.einsum("...ij,...nj->...ni", K, pts_cam)
    return uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-8)


def solve_rigid_tf_np(src: np.ndarray, dst: np.ndarray):
    """Kabsch: R, t minimising ||R src + t - dst|| (numpy, host-side)."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    H = (src - mu_s).T @ (dst - mu_d)
    U, _, Vt = np.linalg.svd(H)
    S = np.eye(3)
    S[2, 2] = np.sign(np.linalg.det(Vt.T @ U.T))
    R = Vt.T @ S @ U.T
    t = mu_d - R @ mu_s
    return R.astype(np.float32), t.astype(np.float32)


def cv2gl_mano(global_orient_aa: np.ndarray, transl: np.ndarray, pivot: np.ndarray):
    """Flip a MANO root pose between OpenCV and OpenGL camera conventions
    (y/z negation about a pivot), host-side numpy.

    Mirrors the semantics of the reference's GL<->CV conversion
    (common/transforms.py; consumed by code/src/utils/io/gt.py:64-82).
    """
    import cv2

    flip = np.diag([1.0, -1.0, -1.0])
    R = np.stack([cv2.Rodrigues(a)[0] for a in np.asarray(global_orient_aa)])
    R_new = flip[None] @ R
    aa_new = np.stack([cv2.Rodrigues(r)[0][:, 0] for r in R_new])
    t_new = (flip[None] @ (np.asarray(transl) + pivot)[..., None])[..., 0] - pivot @ flip.T
    return aa_new.astype(np.float32), t_new.astype(np.float32)
