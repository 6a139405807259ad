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
