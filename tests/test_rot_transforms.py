import jax.numpy as jnp
import numpy as np

from hold_tpu.utils import rot, transforms


def rand_aa(n, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(n, 3) * scale, jnp.float32)


def test_axis_angle_matrix_roundtrip():
    aa = rand_aa(64)
    R = rot.axis_angle_to_matrix(aa)
    # orthonormality
    RtR = jnp.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
    aa2 = rot.matrix_to_axis_angle(R)
    R2 = rot.axis_angle_to_matrix(aa2)
    np.testing.assert_allclose(R, R2, atol=1e-4)


def test_quaternion_roundtrip():
    aa = rand_aa(32, seed=1)
    q = rot.axis_angle_to_quaternion(aa)
    R_direct = rot.axis_angle_to_matrix(aa)
    R_via_q = rot.quaternion_to_matrix(q)
    np.testing.assert_allclose(R_direct, R_via_q, atol=1e-5)
    q2 = rot.matrix_to_quaternion(R_direct)
    # same rotation up to sign
    dot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_rotation_6d():
    aa = rand_aa(16, seed=2)
    R = rot.axis_angle_to_matrix(aa)
    d6 = rot.matrix_to_rotation_6d(R)
    R2 = rot.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_inverse_affine4_matches_linalg():
    rng = np.random.RandomState(3)
    aa = rand_aa(8, seed=3)
    R = np.asarray(rot.axis_angle_to_matrix(aa))
    T = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    T[:, :3, :3] = R * rng.uniform(0.5, 2.0, (8, 1, 1)).astype(np.float32)
    T[:, :3, 3] = rng.randn(8, 3)
    inv = np.asarray(transforms.inverse_affine4(jnp.asarray(T)))
    np.testing.assert_allclose(inv, np.linalg.inv(T), atol=1e-4)


def test_rigid_inverse_and_transform_points():
    aa = rand_aa(4, seed=4)
    R = rot.axis_angle_to_matrix(aa)
    t = jnp.asarray(np.random.RandomState(5).randn(4, 3), jnp.float32)
    T = transforms.rt_to_mat4(R, t)
    Tinv = transforms.inverse_rigid(T)
    eye = jnp.einsum("bij,bjk->bik", T, Tinv)
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (4, 1, 1)), atol=1e-5)

    pts = jnp.asarray(np.random.RandomState(6).randn(4, 10, 3), jnp.float32)
    out = transforms.transform_points(T, pts)
    back = transforms.transform_points(Tinv, out)
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_kabsch():
    rng = np.random.RandomState(7)
    src = rng.randn(50, 3)
    aa = rng.randn(3) * 0.5
    R_gt = np.asarray(rot.axis_angle_to_matrix(jnp.asarray(aa[None], jnp.float32)))[0]
    t_gt = rng.randn(3)
    dst = src @ R_gt.T + t_gt
    R, t = transforms.solve_rigid_tf_np(src, dst)
    np.testing.assert_allclose(R, R_gt, atol=1e-4)
    np.testing.assert_allclose(t, t_gt, atol=1e-4)


def test_slerp_endpoints():
    aa0, aa1 = rand_aa(1, 8), rand_aa(1, 9)
    q0 = rot.axis_angle_to_quaternion(aa0)
    q1 = rot.axis_angle_to_quaternion(aa1)
    np.testing.assert_allclose(rot.quat_slerp(q0, q1, 0.0), q0, atol=1e-5)
    R1 = rot.quaternion_to_matrix(rot.quat_slerp(q0, q1, 1.0))
    np.testing.assert_allclose(R1, rot.quaternion_to_matrix(q1), atol=1e-5)


# ---------------------------------------------------------------------------
# Full rotation library (round 2): quaternion algebra, euler, 6d ref
# convention, geodesic distance — golden vs transcribed common/rot.py formulas
# ---------------------------------------------------------------------------


def np_quaternion_raw_multiply(a, b):
    """common/rot.py:714-735 transcription."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def np_euler_to_quaternion(r):
    """common/rot.py:624-644 transcription."""
    x, y, z = r[..., 0] / 2, r[..., 1] / 2, r[..., 2] / 2
    cx, sx, cy, sy, cz, sz = np.cos(x), np.sin(x), np.cos(y), np.sin(y), np.cos(z), np.sin(z)
    return np.stack([
        cx * cy * cz - sx * sy * sz,
        cx * sy * sz + cy * cz * sx,
        cx * cz * sy - sx * cy * sz,
        cx * cy * sz + sx * cz * sy,
    ], axis=-1)


def test_quaternion_multiply_golden():
    rng = np.random.RandomState(0)
    a = rng.randn(16, 4); a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b = rng.randn(16, 4); b /= np.linalg.norm(b, axis=-1, keepdims=True)
    ref = np_quaternion_raw_multiply(a, b)
    got = np.asarray(rot.quaternion_raw_multiply(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    std = np.asarray(rot.quaternion_multiply(jnp.asarray(a), jnp.asarray(b)))
    assert (std[:, 0] >= 0).all()
    # standardized differs at most by global sign
    np.testing.assert_allclose(np.abs(std), np.abs(ref), atol=1e-6)


def test_quaternion_apply_matches_matrix():
    q = rot.axis_angle_to_quaternion(rand_aa(12, 3))
    R = rot.quaternion_to_matrix(q)
    pts = jnp.asarray(np.random.RandomState(4).randn(12, 3), jnp.float32)
    got = rot.quaternion_apply(q, pts)
    ref = jnp.einsum("bij,bj->bi", R, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_quaternion_invert_roundtrip():
    q = rot.axis_angle_to_quaternion(rand_aa(8, 5))
    qi = rot.quaternion_invert(q)
    prod = np.asarray(rot.quaternion_multiply(q, qi))
    np.testing.assert_allclose(prod, np.tile([1, 0, 0, 0], (8, 1)), atol=1e-5)


def test_euler_quaternion_golden_and_roundtrip():
    rng = np.random.RandomState(1)
    e = rng.uniform(-1.2, 1.2, (32, 3))  # |y| < pi/2: principal branch
    ref_q = np_euler_to_quaternion(e)
    got_q = np.asarray(rot.euler_to_quaternion(jnp.asarray(e, jnp.float32)))
    np.testing.assert_allclose(got_q, ref_q, atol=1e-5)

    # euler_to_matrix composes R = Rx @ Ry @ Rz; single-axis sanity:
    Rx = np.asarray(rot.euler_to_matrix(jnp.asarray([[0.4, 0, 0]], jnp.float32)))[0]
    c, s = np.cos(0.4), np.sin(0.4)
    np.testing.assert_allclose(Rx, [[1, 0, 0], [0, c, -s], [0, s, c]], atol=1e-6)


def _zyx_matrix(e):
    """R = Rz @ Ry @ Rx — the convention matrix_to_euler decomposes."""
    x, y, z = e[..., 0], e[..., 1], e[..., 2]

    def _ax(c, s, k):
        R = np.zeros(e.shape[:-1] + (3, 3))
        if k == 0:
            R[..., 0, 0] = 1; R[..., 1, 1] = c; R[..., 1, 2] = -s
            R[..., 2, 1] = s; R[..., 2, 2] = c
        elif k == 1:
            R[..., 1, 1] = 1; R[..., 0, 0] = c; R[..., 0, 2] = s
            R[..., 2, 0] = -s; R[..., 2, 2] = c
        else:
            R[..., 2, 2] = 1; R[..., 0, 0] = c; R[..., 0, 1] = -s
            R[..., 1, 0] = s; R[..., 1, 1] = c
        return R

    return (_ax(np.cos(z), np.sin(z), 2) @ _ax(np.cos(y), np.sin(y), 1)
            @ _ax(np.cos(x), np.sin(x), 0))


def test_matrix_to_euler_decomposes_zyx():
    rng = np.random.RandomState(3)
    e = rng.uniform(-1.2, 1.2, (32, 3))  # |y| < pi/2: principal branch
    R = _zyx_matrix(e)
    e_back = np.asarray(rot.matrix_to_euler(jnp.asarray(R, jnp.float32)))
    np.testing.assert_allclose(e_back, e, atol=1e-4)


def test_matrix_to_euler_gimbal_lock():
    # y = +pi/2 (r20 = -1): z forced to 0, rotation still round-trips
    e = np.asarray([[0.3, np.pi / 2, 0.2]])
    R = _zyx_matrix(e)
    e_back = np.asarray(rot.matrix_to_euler(jnp.asarray(R, jnp.float32)))
    assert abs(e_back[0, 2]) < 1e-5  # z := 0 in the lock branch
    R_back = _zyx_matrix(e_back)
    np.testing.assert_allclose(R_back, R, atol=1e-4)


def test_geodesic_distance_known_angle():
    for ang in [0.0, 0.5, 1.5, 3.0]:
        aa = jnp.asarray([[0.0, 0.0, ang]], jnp.float32)
        R = rot.axis_angle_to_matrix(aa)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        d = float(rot.compute_geodesic_distance(R, eye)[0])
        assert abs(d - ang) < 1e-4, (ang, d)


def test_rot_aa_is_z_prerotation():
    rng = np.random.RandomState(2)
    aa = jnp.asarray(rng.randn(3) * 0.7, jnp.float32)
    deg = 40.0
    out = rot.rot_aa(aa, deg)
    t = np.deg2rad(-deg)
    Rz = np.array([[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]])
    ref = Rz @ np.asarray(rot.axis_angle_to_matrix(aa))
    got = np.asarray(rot.axis_angle_to_matrix(out))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_rot6d_ref_convention_roundtrip():
    R = rot.axis_angle_to_matrix(rand_aa(16, 6))
    d6 = rot.rotmat_to_rot6d_ref(R)
    R_back = rot.rot6d_to_rotmat_ref(d6)
    np.testing.assert_allclose(np.asarray(R_back), np.asarray(R), atol=1e-5)
    # column convention: first two columns of R are the 6d, interleaved
    ref_d6 = np.asarray(R)[..., :, :2].reshape(16, 6)
    np.testing.assert_allclose(np.asarray(d6), ref_d6, atol=1e-6)


def test_rot6d_conventions_differ_but_both_valid():
    R = rot.axis_angle_to_matrix(rand_aa(4, 7))
    row = rot.rotation_6d_to_matrix(rot.matrix_to_rotation_6d(R))
    col = rot.rot6d_to_rotmat_ref(rot.rotmat_to_rot6d_ref(R))
    np.testing.assert_allclose(np.asarray(row), np.asarray(R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(col), np.asarray(R), atol=1e-5)
