"""Camera math: weak-perspective conversions, translation fitting, orbits.

Role parity with common/camera.py (the reference's grab-bag of camera
helpers used by the generator's hand-pose init and the viewers).  Re-derived
in vectorized JAX: the per-example host loop of the reference's
``estimate_translation_k`` (camera.py:408-455) becomes one vmapped 3x3
closed-form weighted least squares, so a whole sequence of frames solves in
one fused device call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Weak perspective <-> perspective (camera.py:32-73)
# --------------------------------------------------------------------------

def perspective_to_weak_perspective(cam_t, focal_length, img_res):
    """(..., 3) translation [tx, ty, tz] -> [s, tx, ty]."""
    cam_t = jnp.asarray(cam_t)
    s = 2.0 * focal_length / (img_res * cam_t[..., 2] + 1e-9)
    return jnp.stack([s, cam_t[..., 0], cam_t[..., 1]], axis=-1)


def weak_perspective_to_perspective(weak_cam, focal_length, img_res):
    """(..., 3) weak camera [s, tx, ty] -> translation [tx, ty, tz]."""
    weak_cam = jnp.asarray(weak_cam)
    tz = 2.0 * focal_length / (img_res * weak_cam[..., 0] + 1e-9)
    return jnp.stack([weak_cam[..., 1], weak_cam[..., 2], tz], axis=-1)


def default_cam_t(focal_length, img_res):
    """The reference's default [5, 0, 0] weak camera as a translation."""
    return weak_perspective_to_perspective(
        jnp.asarray([[5.0, 0.0, 0.0]]), focal_length, img_res
    )


# --------------------------------------------------------------------------
# Translation estimation (camera.py:361-455)
# --------------------------------------------------------------------------

def estimate_translation_k(S, joints_2d, joints_conf, K):
    """Weighted least-squares camera translation from 2D-3D correspondences.

    S (..., N, 3) 3D joints in camera-rotation space; joints_2d (..., N, 2);
    joints_conf (..., N) weights; K (..., 3, 3).  Returns (..., 3).

    Solves min_t sum_j w_j || f * (S_j + t)_{xy} + (c - u_j) (S_jz + t_z) ||^2
    — the same normal equations the reference builds row-by-row
    (camera.py:361-406), assembled as one closed-form 3x3 system so it
    vmaps/jits over frames.
    """
    S = jnp.asarray(S, jnp.float32)
    uv = jnp.asarray(joints_2d, jnp.float32)
    w = jnp.asarray(joints_conf, jnp.float32)
    K = jnp.asarray(K, jnp.float32)

    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]

    # residual rows: [f_k, 0/0/f_k, (c_k - u_k)] . t = (u_k - c_k) Z - f_k XY
    du = cx - uv[..., 0]  # (.., N)
    dv = cy - uv[..., 1]
    Z = S[..., 2]
    cx_rows = jnp.stack([fx * jnp.ones_like(du), jnp.zeros_like(du), du], -1)
    cy_rows = jnp.stack([jnp.zeros_like(dv), fy * jnp.ones_like(dv), dv], -1)
    bx = (uv[..., 0] - cx) * Z - fx[..., 0:1] * S[..., 0]
    by = (uv[..., 1] - cy) * Z - fy[..., 0:1] * S[..., 1]

    rows = jnp.concatenate([cx_rows, cy_rows], axis=-2)  # (.., 2N, 3)
    rhs = jnp.concatenate([bx, by], axis=-1)  # (.., 2N)
    ww = jnp.concatenate([w, w], axis=-1)  # sqrt(conf) applied twice == conf

    A = jnp.einsum("...ni,...n,...nj->...ij", rows, ww, rows)
    b = jnp.einsum("...ni,...n,...n->...i", rows, ww, rhs)
    return jnp.linalg.solve(
        A + 1e-8 * jnp.eye(3, dtype=jnp.float32), b[..., None]
    )[..., 0]


def estimate_translation(S, joints_2d, joints_conf, focal_length, img_size):
    """Focal/center variant (camera.py:79-125): principal point = img/2."""
    S = jnp.asarray(S, jnp.float32)
    n = jnp.shape(S)[:-2]
    f = jnp.broadcast_to(jnp.asarray(focal_length, jnp.float32), n + (1,))[
        ..., 0
    ]
    c = jnp.asarray(img_size, jnp.float32) / 2.0
    K = jnp.zeros(n + (3, 3), jnp.float32)
    K = K.at[..., 0, 0].set(f).at[..., 1, 1].set(f)
    K = K.at[..., 0, 2].set(c).at[..., 1, 2].set(c).at[..., 2, 2].set(1.0)
    return estimate_translation_k(S, joints_2d, joints_conf, K)


# --------------------------------------------------------------------------
# Orbit / viewer cameras (camera.py:292-348)
# --------------------------------------------------------------------------

def look_at(eye, at=None, up=None, eps=1e-5):
    """Camera-to-world rotation matrix (columns right/up/forward), numpy host-side.

    Convention parity with camera.py:292-316: z = normalize(at - eye)."""
    eye = np.asarray(eye, np.float64).reshape(-1, 3)
    at = np.zeros(3) if at is None else np.asarray(at, np.float64)
    up = np.array([0.0, 0.0, 1.0]) if up is None else np.asarray(up, np.float64)
    z = at[None] - eye
    z = z / np.maximum(np.linalg.norm(z, axis=-1, keepdims=True), eps)
    up_b = np.broadcast_to(up, z.shape)
    x = np.cross(up_b, z)
    x = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), eps)
    y = np.cross(z, x)
    y = y / np.maximum(np.linalg.norm(y, axis=-1, keepdims=True), eps)
    return np.stack([x, y, z], axis=-1).astype(np.float32)  # (B, 3, 3)


def to_sphere(u, v):
    """Unit sphere point from uniforms (camera.py:317-326)."""
    theta = 2.0 * np.pi * np.asarray(u)
    phi = np.arccos(1.0 - 2.0 * np.asarray(v))
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta),
         np.cos(phi)],
        axis=-1,
    ).astype(np.float32)


def sample_on_sphere(rng=None, range_u=(0.0, 1.0), range_v=(0.0, 1.0)):
    rng = rng or np.random
    return to_sphere(
        rng.uniform(*range_u), rng.uniform(*range_v)
    )


def sample_pose_on_sphere(rng=None, range_u=(0.0, 1.0), range_v=(0.0, 1.0),
                          radius=1.0, up=(0.0, 1.0, 0.0)):
    """Random camera-to-world 4x4 looking at the origin from a sphere."""
    loc = sample_on_sphere(rng, range_u, range_v) * radius
    R = look_at(loc, up=np.asarray(up))[0]
    RT = np.eye(4, dtype=np.float32)
    RT[:3, :3] = R
    RT[:3, 3] = loc
    return RT


def rectify_pose(camera_r, body_aa):
    """Rotate a global-orient axis-angle into the camera frame
    (camera.py:349-360)."""
    import cv2

    camera_r = np.asarray(camera_r, np.float64)
    body_aa = np.asarray(body_aa, np.float64)
    Rb = cv2.Rodrigues(body_aa)[0]
    out = cv2.Rodrigues(camera_r @ Rb)[0].reshape(3)
    return out.astype(np.float32)


def get_coord_maps(size=56):
    """Normalized (x, y) coordinate maps, (1, 2, size, size)
    (camera.py:260-291)."""
    r = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    xx = np.broadcast_to(r[None, :], (size, size))
    yy = np.broadcast_to(r[:, None], (size, size))
    return np.stack([xx, yy])[None]
