import jax
import jax.numpy as jnp
import numpy as np

from hold_tpu.models.density import (
    init_laplace_density,
    laplace_beta,
    laplace_density,
)
from hold_tpu.models.embedders import (
    barf_alpha,
    barf_embed,
    barf_weights,
    embed_dim,
    fourier_embed,
)
from hold_tpu.models.mlp import (
    apply_implicit_net,
    apply_rendering_net,
    implicit_net_shapes,
    init_implicit_net,
    init_rendering_net,
    rendering_net_shapes,
)
from hold_tpu.utils.config import DEFAULT_CONFIG

MANO_SPECS = {"pose_dim": 45, "embedding": "fourier"}
OBJ_SPECS = {"pose_dim": 0, "embedding": "barf"}
BG_SPECS = {"pose_dim": 45, "embedding": "fourier"}


def test_fourier_embed_layout():
    x = jnp.asarray([[0.5, -0.2, 1.0]])
    enc = fourier_embed(x, 6)
    assert enc.shape == (1, embed_dim(3, 6)) == (1, 39)
    np.testing.assert_allclose(enc[0, :3], x[0], atol=1e-6)
    # block order per freq: [sin(2^k x) (3), cos(2^k x) (3)]
    for k in range(6):
        base = 3 + k * 6
        np.testing.assert_allclose(enc[0, base:base + 3], np.sin(2.0**k * np.asarray(x[0])), atol=1e-5)
        np.testing.assert_allclose(enc[0, base + 3:base + 6], np.cos(2.0**k * np.asarray(x[0])), atol=1e-5)


def test_barf_alpha_schedule():
    L, s, e = 6, 1000, 10000
    assert float(barf_alpha(jnp.asarray(0), L, s, e)) == 0.0
    assert float(barf_alpha(jnp.asarray(999), L, s, e)) == 0.0
    mid = float(barf_alpha(jnp.asarray(s + (e - s - 1) // 2), L, s, e))
    assert 2.9 < mid < 3.1
    assert float(barf_alpha(jnp.asarray(e), L, s, e)) == L
    assert float(barf_alpha(jnp.asarray(10 * e), L, s, e)) == L


def test_barf_weights_window():
    w = np.asarray(barf_weights(jnp.asarray(2.5), 6))
    np.testing.assert_allclose(w[:2], 1.0, atol=1e-6)  # passed freqs fully on
    np.testing.assert_allclose(w[2], (1 - np.cos(0.5 * np.pi)) / 2, atol=1e-6)
    np.testing.assert_allclose(w[3:], 0.0, atol=1e-6)  # future freqs off


def test_barf_embed_zero_alpha_keeps_input_only():
    x = jnp.asarray([[0.3, 0.1, -0.7]])
    enc = barf_embed(x, 6, jnp.asarray(0.0))
    np.testing.assert_allclose(enc[0, :3], x[0], atol=1e-6)
    np.testing.assert_allclose(enc[0, 3:], 0.0, atol=1e-6)


def test_implicit_net_sphere_init():
    """Geometric init should produce an approximately spherical SDF."""
    opt = DEFAULT_CONFIG["model"]["implicit_network"]
    plan = implicit_net_shapes(opt, MANO_SPECS)
    params = init_implicit_net(jax.random.PRNGKey(0), opt, MANO_SPECS)
    pts = jnp.asarray(np.random.RandomState(0).randn(512, 3), jnp.float32)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)  # unit sphere
    cond = jnp.zeros((512, 45))
    out = apply_implicit_net(params, plan, pts, cond)
    assert out.shape == (512, 257)
    sdf_unit = np.asarray(out[:, 0])
    out0 = apply_implicit_net(params, plan, jnp.zeros((1, 3)), jnp.zeros((1, 45)))
    sdf_origin = float(out0[0, 0])
    # origin clearly inside, unit-sphere points clearly outside relative to it
    assert sdf_origin < sdf_unit.mean()
    assert sdf_unit.std() < 0.2  # roughly radially symmetric


def test_implicit_net_pose_cond_is_zeroed_for_mano():
    opt = DEFAULT_CONFIG["model"]["implicit_network"]
    plan = implicit_net_shapes(opt, MANO_SPECS)
    params = init_implicit_net(jax.random.PRNGKey(1), opt, MANO_SPECS)
    pts = jnp.asarray(np.random.RandomState(1).randn(16, 3) * 0.1, jnp.float32)
    a = apply_implicit_net(params, plan, pts, jnp.zeros((16, 45)))
    b = apply_implicit_net(params, plan, pts, jnp.ones((16, 45)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_bg_implicit_net_frame_cond_matters():
    opt = DEFAULT_CONFIG["model"]["bg_implicit_network"]
    specs = dict(BG_SPECS)
    plan = implicit_net_shapes(opt, specs)
    assert plan["cond_dim"] == 32
    params = init_implicit_net(jax.random.PRNGKey(2), opt, specs)
    pts = jnp.asarray(np.random.RandomState(2).randn(8, 4) * 0.1, jnp.float32)
    a = apply_implicit_net(params, plan, pts, jnp.zeros((8, 32)))
    b = apply_implicit_net(params, plan, pts, jnp.ones((8, 32)))
    assert float(jnp.abs(a - b).max()) > 1e-4


def test_rendering_net_pose_mode():
    opt = DEFAULT_CONFIG["model"]["rendering_network"]
    plan = rendering_net_shapes(opt, MANO_SPECS)
    params = init_rendering_net(jax.random.PRNGKey(3), opt, MANO_SPECS)
    N = 32
    rng = np.random.RandomState(3)
    rgb = apply_rendering_net(
        params, plan,
        jnp.asarray(rng.randn(N, 3), jnp.float32),
        jnp.asarray(rng.randn(N, 3), jnp.float32),
        None,
        jnp.asarray(rng.randn(N, 45), jnp.float32),
        jnp.asarray(rng.randn(N, 256), jnp.float32),
    )
    assert rgb.shape == (N, 3)
    assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0


def test_rendering_net_nerf_frame_mode():
    opt = DEFAULT_CONFIG["model"]["bg_rendering_network"]
    plan = rendering_net_shapes(opt, BG_SPECS)
    params = init_rendering_net(jax.random.PRNGKey(4), opt, BG_SPECS)
    N = 16
    rng = np.random.RandomState(4)
    rgb = apply_rendering_net(
        params, plan, None, None,
        jnp.asarray(rng.randn(N, 3), jnp.float32),
        None,
        jnp.asarray(rng.randn(N, 256), jnp.float32),
        frame_latent_code=jnp.asarray(rng.randn(N, 32), jnp.float32),
    )
    assert rgb.shape == (N, 3)


def test_laplace_density():
    params = init_laplace_density({"beta": 0.1})
    beta = laplace_beta(params)
    np.testing.assert_allclose(beta, 0.1001, atol=1e-6)
    sdf = jnp.asarray([-1.0, -0.01, 0.0, 0.01, 1.0])
    d = np.asarray(laplace_density(params, sdf))
    # monotone decreasing in sdf; 1/(2 beta) at the surface
    assert np.all(np.diff(d) < 0)
    np.testing.assert_allclose(d[2], 0.5 / 0.1001, rtol=1e-5)
    # deep inside -> alpha, far outside -> 0
    np.testing.assert_allclose(d[0], 1 / 0.1001, rtol=1e-3)
    assert d[-1] < 1e-3


def test_implicit_net_gradient_near_unit():
    """Geometric init => |grad sdf| ~ 1 away from origin (eikonal prior)."""
    opt = DEFAULT_CONFIG["model"]["implicit_network"]
    plan = implicit_net_shapes(opt, MANO_SPECS)
    params = init_implicit_net(jax.random.PRNGKey(5), opt, MANO_SPECS)

    def sdf(p):
        return apply_implicit_net(params, plan, p[None], jnp.zeros((1, 45)))[0, 0]

    pts = np.random.RandomState(5).randn(64, 3).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    grads = jax.vmap(jax.grad(sdf))(jnp.asarray(pts * 0.8))
    norms = np.linalg.norm(np.asarray(grads), axis=-1)
    assert 0.5 < norms.mean() < 2.0
