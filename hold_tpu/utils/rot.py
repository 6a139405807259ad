"""Rotation-representation conversions in JAX (axis-angle / matrix / quaternion / 6d).

Functional equivalents of the conversion library the reference keeps at
``common/rot.py`` (torch).  All functions are batched over leading dims and
safe under jit/vmap (no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula. aa: (..., 3) -> (..., 3, 3)."""
    angle = jnp.linalg.norm(aa + _EPS, axis=-1, keepdims=True)
    axis = aa / angle
    c = jnp.cos(angle)[..., None]
    s = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(aa.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    return eye + s * K + (1.0 - c) * (K @ K)


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz, w >= 0."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def branch_vals():
        # four candidate quaternions (unnormalised), one per dominant diagonal
        qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
        qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
        qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], -1)
        qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], -1)
        return qw, qx, qy, qz

    qw, qx, qy, qz = branch_vals()
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4cand, 4)
    scores = jnp.stack(
        [tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1
    )
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> (..., 3, 3)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    xyz = q[..., 1:]
    n = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(n, w)
    small = n < _EPS
    axis = jnp.where(small, jnp.zeros_like(xyz).at[..., 0].set(1.0), xyz / jnp.maximum(n, _EPS))
    return axis * angle


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(R))


def axis_angle_to_quaternion(aa: jnp.ndarray) -> jnp.ndarray:
    angle = jnp.linalg.norm(aa + _EPS, axis=-1, keepdims=True)
    axis = aa / angle
    half = angle * 0.5
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3), Gram-Schmidt on the two columns."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(R: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical linear interpolation between unit quaternions (wxyz)."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_t = jnp.sin(theta)
    near = sin_t < 1e-5
    w0 = jnp.where(near, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_t, _EPS))
    w1 = jnp.where(near, t, jnp.sin(t * theta) / jnp.maximum(sin_t, _EPS))
    q = w0 * q0 + w1 * q1
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


# ---------------------------------------------------------------------------
# Quaternion algebra (common/rot.py:31-61, 714-776)
# ---------------------------------------------------------------------------


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    """Non-negative real part (common/rot.py:31-43)."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quaternion_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, wxyz (common/rot.py:714-735)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    ow = aw * bw - ax * bx - ay * by - az * bz
    ox = aw * bx + ax * bw + ay * bz - az * by
    oy = aw * by - ax * bz + ay * bw + az * bx
    oz = aw * bz + ax * by - ay * bx + az * bw
    return jnp.stack([ow, ox, oy, oz], axis=-1)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Composition with standardized output (common/rot.py:46-61)."""
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a versor (common/rot.py:736-750)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quaternion_apply(q: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3D points by versors (common/rot.py:753-774)."""
    real = jnp.zeros(point.shape[:-1] + (1,), dtype=point.dtype)
    p = jnp.concatenate([real, point], axis=-1)
    out = quaternion_raw_multiply(quaternion_raw_multiply(q, p),
                                  quaternion_invert(q))
    return out[..., 1:]


# ---------------------------------------------------------------------------
# Euler angles (common/rot.py:620-713; xyz intrinsic convention)
# ---------------------------------------------------------------------------


def euler_to_quaternion(r: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) euler xyz -> (..., 4) wxyz (common/rot.py:624-644)."""
    x, y, z = r[..., 0] / 2.0, r[..., 1] / 2.0, r[..., 2] / 2.0
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    return jnp.stack(
        [
            cx * cy * cz - sx * sy * sz,
            cx * sy * sz + cy * cz * sx,
            cx * cz * sy - sx * cy * sz,
            cx * cy * sz + sx * cz * sy,
        ],
        axis=-1,
    )


def euler_to_matrix(r: jnp.ndarray) -> jnp.ndarray:
    """batch_euler2matrix parity (common/rot.py:620-621)."""
    return quaternion_to_matrix(euler_to_quaternion(r))


def matrix_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Principal euler solution decomposing R = Rz(z) @ Ry(y) @ Rx(x).

    Jittable re-derivation of euler_angles_from_rotmat
    (common/rot.py:680-713, Slabaugh's ZYX decomposition): the reference
    returns the two analytic branches (and special-cases gimbal lock with
    python control flow); we return the principal branch (the reference's s1)
    with a `where`-based gimbal-lock fallback so the function traces under
    jit.

    NOTE (same caveat as the reference library): this decomposes the ZYX
    product, while euler_to_matrix/euler_to_quaternion *compose* in XYZ order
    (R = Rx @ Ry @ Rz, common/rot.py:624-644) — the two are not inverses of
    each other, in the reference or here.
    """
    r20 = jnp.clip(R[..., 2, 0], -1.0, 1.0)
    y = -jnp.arcsin(r20)
    cy = jnp.cos(y)
    safe = jnp.abs(cy) > 1e-6
    cy_s = jnp.where(safe, cy, 1.0)
    x = jnp.arctan2(R[..., 2, 1] / cy_s, R[..., 2, 2] / cy_s)
    z = jnp.arctan2(R[..., 1, 0] / cy_s, R[..., 0, 0] / cy_s)
    # gimbal lock: r20 = ∓1 -> y = ±pi/2, z := 0 (reference's convention)
    x_lock = jnp.where(
        r20 < 0,
        jnp.arctan2(R[..., 0, 1], R[..., 0, 2]),
        -jnp.arctan2(-R[..., 0, 1], R[..., 0, 2]),
    )
    x = jnp.where(safe, x, x_lock)
    z = jnp.where(safe, z, 0.0)
    return jnp.stack([x, y, z], axis=-1)


# ---------------------------------------------------------------------------
# Misc (common/rot.py:11-29, 219-236, 390-412)
# ---------------------------------------------------------------------------


def compute_geodesic_distance(m1: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Angular distance between rotation matrices in [0, pi]
    (common/rot.py:11-29)."""
    m = m1 @ jnp.swapaxes(m2, -1, -2)
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def rot_aa(aa: jnp.ndarray, rot_deg) -> jnp.ndarray:
    """Rotate a global-orientation axis-angle by `rot_deg` degrees about +z
    (common/rot.py:219-236, cv2.Rodrigues path expressed via the library)."""
    t = jnp.deg2rad(jnp.asarray(-rot_deg, jnp.float32))
    Rz = jnp.asarray(
        [[jnp.cos(t), -jnp.sin(t), 0.0],
         [jnp.sin(t), jnp.cos(t), 0.0],
         [0.0, 0.0, 1.0]]
    )
    return matrix_to_axis_angle(Rz @ axis_angle_to_matrix(aa))


def rot6d_to_rotmat_ref(x: jnp.ndarray) -> jnp.ndarray:
    """Reference/SPIN column-convention 6d -> matrix (common/rot.py:390-405).

    NOTE: this is a *different* convention from rotation_6d_to_matrix (the
    pytorch3d row convention used inside hold_tpu); provided for IO parity
    with data produced by the reference."""
    x = x.reshape(x.shape[:-1] + (3, 2))
    a1, a2 = x[..., 0], x[..., 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=-1, keepdims=True), _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d_ref(R: jnp.ndarray) -> jnp.ndarray:
    """Reference column-convention matrix -> 6d (common/rot.py:407-411)."""
    return R[..., :, :2].reshape(R.shape[:-2] + (6,))
