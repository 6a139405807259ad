import jax.numpy as jnp
import numpy as np

from hold_tpu.utils.camera import (
    estimate_translation,
    estimate_translation_k,
    get_coord_maps,
    look_at,
    perspective_to_weak_perspective,
    sample_pose_on_sphere,
    to_sphere,
    weak_perspective_to_perspective,
)


def _project(K, pts):
    uvw = pts @ np.asarray(K).T
    return uvw[:, :2] / uvw[:, 2:3]


def test_weak_perspective_roundtrip():
    rng = np.random.RandomState(0)
    cam_t = rng.randn(6, 3).astype(np.float32)
    cam_t[:, 2] = np.abs(cam_t[:, 2]) + 0.5
    weak = perspective_to_weak_perspective(cam_t, 500.0, 224)
    back = weak_perspective_to_perspective(weak, 500.0, 224)
    np.testing.assert_allclose(np.asarray(back), cam_t, atol=1e-4)


def test_estimate_translation_k_recovers_gt():
    rng = np.random.RandomState(1)
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)
    for _ in range(5):
        S = rng.randn(21, 3).astype(np.float32) * 0.08
        t_true = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2),
                           rng.uniform(0.4, 1.0)], np.float32)
        uv = _project(K, S + t_true)
        conf = np.ones(21, np.float32)
        t = np.asarray(estimate_translation_k(S, uv, conf, K))
        np.testing.assert_allclose(t, t_true, atol=1e-3)


def test_estimate_translation_k_batched_and_weighted():
    rng = np.random.RandomState(2)
    K = np.array([[500.0, 0, 160], [0, 500.0, 120], [0, 0, 1]], np.float32)
    B = 4
    S = rng.randn(B, 21, 3).astype(np.float32) * 0.08
    t_true = np.stack([
        rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
        rng.uniform(0.5, 1.0, B)], -1).astype(np.float32)
    uv = np.stack([_project(K, S[i] + t_true[i]) for i in range(B)])
    # corrupt one joint per frame but zero its confidence
    uv[:, 0] += 500.0
    conf = np.ones((B, 21), np.float32)
    conf[:, 0] = 0.0
    t = np.asarray(
        estimate_translation_k(S, uv, conf, np.tile(K, (B, 1, 1)))
    )
    np.testing.assert_allclose(t, t_true, atol=1e-3)


def test_estimate_translation_focal_variant():
    rng = np.random.RandomState(3)
    f, img = 450.0, 256
    K = np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32)
    S = rng.randn(21, 3).astype(np.float32) * 0.05
    t_true = np.array([0.05, -0.03, 0.7], np.float32)
    uv = _project(K, S + t_true)
    t = np.asarray(
        estimate_translation(S, uv, np.ones(21, np.float32), f, img)
    )
    np.testing.assert_allclose(t, t_true, atol=1e-3)


def test_look_at_points_camera_at_target():
    eye = np.array([1.0, 2.0, 3.0])
    R = look_at(eye)[0]  # columns right/up/forward
    fwd = R[:, 2]
    np.testing.assert_allclose(fwd, -eye / np.linalg.norm(eye), atol=1e-5)
    # orthonormal
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)


def test_sphere_sampling_and_pose():
    p = to_sphere(0.3, 0.7)
    np.testing.assert_allclose(np.linalg.norm(p), 1.0, atol=1e-5)
    RT = sample_pose_on_sphere(np.random.RandomState(0), radius=2.0)
    assert RT.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(RT[:3, 3]), 2.0, atol=1e-4)
    # camera looks at the origin: forward axis ~ -loc direction
    fwd = RT[:3, :3][:, 2]
    np.testing.assert_allclose(
        fwd, -RT[:3, 3] / np.linalg.norm(RT[:3, 3]), atol=1e-5
    )


def test_coord_maps():
    m = get_coord_maps(8)
    assert m.shape == (1, 2, 8, 8)
    np.testing.assert_allclose(m[0, 0, 0], np.linspace(-1, 1, 8), atol=1e-6)
