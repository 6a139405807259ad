import jax
import jax.numpy as jnp
import numpy as np

from hold_tpu.ops.knn import (
    knn_blend_weights_pallas,
    knn_blend_weights_xla,
    skinning,
    skinning_jacobian,
)


def _setup(B=2, P=100, V=77, J=16, seed=0):
    rng = np.random.RandomState(seed)
    pts = jnp.asarray(rng.randn(B, P, 3) * 0.1, jnp.float32)
    verts = jnp.asarray(rng.randn(B, V, 3) * 0.1, jnp.float32)
    w = rng.rand(B, V, J).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    return pts, verts, jnp.asarray(w)


def _brute_force(pts, verts, skin_weights, K, max_dist):
    pts, verts, w = map(np.asarray, (pts, verts, skin_weights))
    B, P, _ = pts.shape
    out_w = np.zeros((B, P, w.shape[-1]), np.float32)
    out_m = np.zeros((B, P), bool)
    for b in range(B):
        d2 = ((pts[b][:, None] - verts[b][None]) ** 2).sum(-1)
        d2 = np.minimum(d2, 4.0)
        idx = np.argsort(d2, axis=1)[:, :K]
        d2k = np.take_along_axis(d2, idx, 1)
        conf = np.exp(-d2k)
        conf /= conf.sum(-1, keepdims=True)
        out_w[b] = (w[b][idx] * conf[..., None]).sum(1)
        out_m[b] = np.sqrt(d2k[:, 0]) > max_dist
    return out_w, out_m


def test_xla_matches_brute_force():
    pts, verts, w = _setup()
    got_w, got_m = knn_blend_weights_xla(pts, verts, w, K=5, max_dist=0.1)
    exp_w, exp_m = _brute_force(pts, verts, w, 5, 0.1)
    np.testing.assert_allclose(got_w, exp_w, atol=1e-5)
    np.testing.assert_array_equal(got_m, exp_m)
    # rows remain a partition of unity
    np.testing.assert_allclose(np.asarray(got_w).sum(-1), 1.0, atol=1e-5)


def test_pallas_interpret_matches_xla():
    pts, verts, w = _setup(B=1, P=64, V=50, J=16, seed=1)
    w_x, m_x = knn_blend_weights_xla(pts, verts, w, K=7, max_dist=0.08)
    w_p, m_p = knn_blend_weights_pallas(pts, verts, w, K=7, max_dist=0.08,
                                        interpret=True)
    np.testing.assert_allclose(w_p, w_x, atol=1e-5)
    np.testing.assert_array_equal(m_p, m_x)


def test_pallas_transposed_interpret_matches_xla():
    from hold_tpu.ops.knn import _knn_pallas_single_t

    pts, verts, w = _setup(B=1, P=64, V=50, J=16, seed=3)
    w_x, m_x = knn_blend_weights_xla(pts, verts, w, K=7, max_dist=0.08)
    w_t, m_t = _knn_pallas_single_t(pts[0], verts[0], w[0], 7, 0.08,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(w_t).T, w_x[0], atol=1e-5)
    np.testing.assert_array_equal(m_t, m_x[0])


def test_skinning_t_matches_skinning():
    from hold_tpu.ops.knn import skinning_jacobian_inv_t, skinning_t
    from hold_tpu.utils.rot import axis_angle_to_matrix
    from hold_tpu.utils.transforms import inverse_mat3

    rng = np.random.RandomState(5)
    B, P, J = 2, 40, 16
    aa = jnp.asarray(rng.randn(B, J, 3) * 0.4, jnp.float32)
    tfs = jnp.zeros((B, J, 4, 4))
    tfs = tfs.at[..., :3, :3].set(axis_angle_to_matrix(aa))
    tfs = tfs.at[..., :3, 3].set(jnp.asarray(rng.randn(B, J, 3) * 0.1, jnp.float32))
    tfs = tfs.at[..., 3, 3].set(1.0)
    w = rng.rand(B, P, J).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    w = jnp.asarray(w)
    x = jnp.asarray(rng.randn(B, P, 3) * 0.1, jnp.float32)

    for inverse in (False, True):
        ref = skinning(x, w, tfs, inverse=inverse)
        got = skinning_t(x, jnp.swapaxes(w, 1, 2), tfs, inverse=inverse)
        np.testing.assert_allclose(got, ref, atol=2e-5)

    jinv_ref = inverse_mat3(skinning_jacobian(w, tfs).reshape(-1, 3, 3))
    jinv_t = skinning_jacobian_inv_t(jnp.swapaxes(w, 1, 2), tfs)
    np.testing.assert_allclose(
        jinv_t.reshape(-1, 3, 3), jinv_ref, atol=2e-5
    )


def test_weights_are_stop_gradient():
    pts, verts, w = _setup(B=1, P=10, V=20, J=4)

    def f(p):
        bw, _ = knn_blend_weights_xla(p, verts, w, K=3)
        return jnp.sum(bw)

    g = jax.grad(f)(pts)
    np.testing.assert_allclose(g, 0.0, atol=1e-8)


def test_skinning_inverse_roundtrip():
    rng = np.random.RandomState(2)
    from hold_tpu.utils.rot import axis_angle_to_matrix

    B, P, J = 2, 50, 16
    aa = jnp.asarray(rng.randn(B, J, 3) * 0.3, jnp.float32)
    R = axis_angle_to_matrix(aa)
    tfs = jnp.zeros((B, J, 4, 4))
    tfs = tfs.at[..., :3, :3].set(R)
    tfs = tfs.at[..., :3, 3].set(jnp.asarray(rng.randn(B, J, 3) * 0.1, jnp.float32))
    tfs = tfs.at[..., 3, 3].set(1.0)
    w = rng.rand(B, P, J).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    w = jnp.asarray(w)
    x = jnp.asarray(rng.randn(B, P, 3) * 0.1, jnp.float32)

    x_d = skinning(x, w, tfs, inverse=False)
    x_back = skinning(x_d, w, tfs, inverse=True)
    np.testing.assert_allclose(x_back, x, atol=1e-5)


def test_skinning_jacobian_matches_autodiff():
    rng = np.random.RandomState(3)
    from hold_tpu.utils.rot import axis_angle_to_matrix

    B, P, J = 1, 5, 16
    aa = jnp.asarray(rng.randn(B, J, 3) * 0.3, jnp.float32)
    tfs = jnp.zeros((B, J, 4, 4))
    tfs = tfs.at[..., :3, :3].set(axis_angle_to_matrix(aa))
    tfs = tfs.at[..., :3, 3].set(jnp.asarray(rng.randn(B, J, 3) * 0.1, jnp.float32))
    tfs = tfs.at[..., 3, 3].set(1.0)
    w = rng.rand(B, P, J).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    w = jnp.asarray(w)
    x = jnp.asarray(rng.randn(B, P, 3) * 0.1, jnp.float32)

    J_closed = skinning_jacobian(w, tfs)
    # autodiff with weights held fixed (the stop-gradient contract)
    jac = jax.vmap(
        jax.vmap(
            lambda xi, wi: jax.jacfwd(
                lambda p: skinning(p[None, None], wi[None, None], tfs)[0, 0]
            )(xi)
        )
    )(x, w)
    np.testing.assert_allclose(J_closed, jac, atol=1e-5)


def test_fused_inverse_warp_matches_composition():
    from hold_tpu.ops.knn import knn_inverse_warp
    from hold_tpu.utils.rot import axis_angle_to_matrix

    rng = np.random.RandomState(9)
    B, P, V, J = 2, 70, 60, 16
    pts = jnp.asarray(rng.randn(B, P, 3) * 0.1, jnp.float32)
    verts = jnp.asarray(rng.randn(B, V, 3) * 0.1, jnp.float32)
    w = rng.rand(B, V, J).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    w = jnp.asarray(w)
    aa = jnp.asarray(rng.randn(B, J, 3) * 0.3, jnp.float32)
    tfs = jnp.zeros((B, J, 4, 4))
    tfs = tfs.at[..., :3, :3].set(axis_angle_to_matrix(aa))
    tfs = tfs.at[..., :3, 3].set(
        jnp.asarray(rng.randn(B, J, 3) * 0.1, jnp.float32))
    tfs = tfs.at[..., 3, 3].set(1.0)

    wx, mx = knn_blend_weights_xla(pts, verts, w, K=7, max_dist=0.08)
    ref = skinning(pts, wx, tfs, inverse=True)
    got, m = knn_inverse_warp(pts, verts, w, tfs, K=7, max_dist=0.08,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(mx))


def _rand_scene(seed, B=2, P=60, V=50, J=16):
    from hold_tpu.utils.rot import axis_angle_to_matrix

    rng = np.random.RandomState(seed)
    pts = jnp.asarray(rng.randn(B, P, 3) * 0.1, jnp.float32)
    verts = jnp.asarray(rng.randn(B, V, 3) * 0.1, jnp.float32)
    w = rng.rand(B, V, J).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    aa = jnp.asarray(rng.randn(B, J, 3) * 0.3, jnp.float32)
    tfs = jnp.zeros((B, J, 4, 4))
    tfs = tfs.at[..., :3, :3].set(axis_angle_to_matrix(aa))
    tfs = tfs.at[..., :3, 3].set(
        jnp.asarray(rng.randn(B, J, 3) * 0.1, jnp.float32))
    tfs = tfs.at[..., 3, 3].set(1.0)
    return pts, verts, jnp.asarray(w), tfs, rng


def test_diff_warp_forward_and_vjp_match_xla():
    from hold_tpu.ops.knn import knn_inverse_warp_diff

    pts, verts, w, tfs, rng = _rand_scene(4)

    def ref_fn(p, tf):
        ww, m = knn_blend_weights_xla(p, verts, w, K=7, max_dist=0.08)
        return skinning(p, ww, tf, inverse=True), m

    def new_fn(p, tf):
        return knn_inverse_warp_diff(p, verts, w, tf, K=7, max_dist=0.08,
                                     interpret=True)

    xr, mr = ref_fn(pts, tfs)
    xn, mn = new_fn(pts, tfs)
    np.testing.assert_allclose(np.asarray(xn), np.asarray(xr), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(mn), np.asarray(mr))

    tgt = jnp.asarray(rng.randn(*xr.shape) * 0.05, jnp.float32)
    gr = jax.grad(lambda p, tf: jnp.sum((ref_fn(p, tf)[0] - tgt) ** 2),
                  argnums=(0, 1))(pts, tfs)
    gn = jax.grad(lambda p, tf: jnp.sum((new_fn(p, tf)[0] - tgt) ** 2),
                  argnums=(0, 1))(pts, tfs)
    np.testing.assert_allclose(np.asarray(gn[0]), np.asarray(gr[0]),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gn[1][..., :3, :]),
                               np.asarray(gr[1][..., :3, :]),
                               atol=3e-4, rtol=1e-3)


def test_jacobian_inverse_kernel_and_vjp_match_xla():
    from hold_tpu.ops.knn import knn_jacobian_inverse
    from hold_tpu.utils.transforms import inverse_mat3

    pts, verts, w, tfs, rng = _rand_scene(5)
    B, P = pts.shape[:2]

    def ref_fn(tf):
        ww, _ = knn_blend_weights_xla(pts, verts, w, K=7)
        return inverse_mat3(
            skinning_jacobian(ww, tf).reshape(-1, 3, 3)).reshape(B, P, 9)

    def new_fn(tf):
        return knn_jacobian_inverse(pts, verts, w, tf, K=7, interpret=True)

    np.testing.assert_allclose(np.asarray(new_fn(tfs)),
                               np.asarray(ref_fn(tfs)), atol=3e-5)
    tgt = jnp.asarray(rng.randn(B, P, 9) * 0.05, jnp.float32)
    gr = jax.grad(lambda tf: jnp.sum((ref_fn(tf) - tgt) ** 2))(tfs)
    gn = jax.grad(lambda tf: jnp.sum((new_fn(tf) - tgt) ** 2))(tfs)
    np.testing.assert_allclose(np.asarray(gn[..., :3, :3]),
                               np.asarray(gr[..., :3, :3]),
                               atol=5e-3, rtol=1e-3)
