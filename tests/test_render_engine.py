import jax
import jax.numpy as jnp
import numpy as np

from hold_tpu.render.ray_sampler import (
    SamplerConfig,
    error_bound_z_vals,
    inverse_sphere_z_vals,
    sample_pdf,
    uniform_z_vals,
)
from hold_tpu.render.volsdf import (
    density2weight,
    get_camera_rays,
    get_sphere_intersections,
    integrate,
    merge_factors,
)
from hold_tpu.render.background import depth2pts_outside
from hold_tpu.ops.point_mesh import signed_distance_to_mesh


def test_density2weight_opaque_wall():
    """A huge density at one sample should absorb the ray there."""
    R, S = 4, 16
    z = jnp.broadcast_to(jnp.linspace(0.1, 2.0, S)[None], (R, S))
    density = jnp.zeros((R, S)).at[:, 8].set(1e5)
    fg_w, bg_w = density2weight(density, z, jnp.full((R,), 2.5))
    w = np.asarray(fg_w)
    assert np.all(w[:, 8] > 0.99)
    np.testing.assert_allclose(np.asarray(bg_w), 0.0, atol=1e-5)
    # weights + bg sum to 1
    np.testing.assert_allclose(w.sum(1) + np.asarray(bg_w), 1.0, atol=1e-5)


def test_density2weight_empty_space():
    R, S = 3, 8
    z = jnp.broadcast_to(jnp.linspace(0.1, 2.0, S)[None], (R, S))
    fg_w, bg_w = density2weight(jnp.zeros((R, S)), z, jnp.full((R,), 2.5))
    np.testing.assert_allclose(np.asarray(bg_w), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fg_w), 0.0, atol=1e-6)


def test_integrate():
    vals = jnp.ones((2, 4, 3)) * jnp.asarray([1.0, 2.0, 3.0])
    w = jnp.full((2, 4), 0.25)
    np.testing.assert_allclose(integrate(vals, w), [[1, 2, 3]] * 2, atol=1e-6)


def test_merge_factors_sorting_and_bookends():
    R = 2
    S = 5
    f1 = {
        "z_vals": jnp.broadcast_to(jnp.asarray([0.0, 1.0, 3.0, 5.0, 9.0])[None], (R, S)),
        "color": jnp.ones((R, S, 3)) * 1.0,
    }
    f2 = {
        "z_vals": jnp.broadcast_to(jnp.asarray([0.0, 2.0, 4.0, 6.0, 9.0])[None], (R, S)),
        "color": jnp.ones((R, S, 3)) * 2.0,
    }
    out = merge_factors([f1, f2])
    z = np.asarray(out["z_vals"])
    # sorted ascending
    assert np.all(np.diff(z, axis=1) >= 0)
    # CVPR book-end slice: 2S - (num_nodes-1) - num_nodes = 10 - 3 = 7
    assert z.shape == (R, 7)
    assert out["color"].shape == (R, 7, 3)
    # z_max is the second-to-last of the sorted cat (index -num_nodes)
    np.testing.assert_allclose(np.asarray(out["z_max"]), 9.0)


def test_camera_rays_center_pixel():
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 100.0
    K[0, 2], K[1, 2] = 32.0, 24.0
    ext = np.eye(4, dtype=np.float32)  # camera at origin looking +z
    uv = jnp.asarray([[[32.0, 24.0], [132.0, 24.0]]])
    dirs, loc = get_camera_rays(uv, jnp.asarray(ext)[None], jnp.asarray(K)[None])
    np.testing.assert_allclose(np.asarray(loc)[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dirs)[0, 0], [0, 0, 1], atol=1e-5)
    # one-focal-length offset pixel -> 45 degrees
    np.testing.assert_allclose(
        np.asarray(dirs)[0, 1], [np.sqrt(0.5), 0, np.sqrt(0.5)], atol=1e-5
    )


def test_sphere_intersections():
    cam = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    both = np.asarray(get_sphere_intersections(cam, d, r=1.0))
    np.testing.assert_allclose(both[0], [1.0, 3.0], atol=1e-5)


def test_uniform_z_vals_eval_and_train():
    rng = jax.random.PRNGKey(0)
    dirs = jnp.zeros((4, 3)).at[:, 2].set(1.0)
    cam = jnp.zeros((4, 3))
    z_eval = uniform_z_vals(None, dirs, cam, 0.0, 6.0, 8, training=False)
    np.testing.assert_allclose(np.asarray(z_eval)[0], np.linspace(0, 6, 8), atol=1e-5)
    z_tr = uniform_z_vals(rng, dirs, cam, 0.0, 6.0, 8, training=True)
    z = np.asarray(z_tr)
    assert np.all(np.diff(z, axis=1) > 0)
    assert z.min() >= 0 and z.max() <= 6.0


def test_sample_pdf_uniform_dist():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9)[None], (2, 9))
    pdf = jnp.full((2, 8), 1 / 8)
    cdf = jnp.cumsum(pdf, axis=-1)
    u = jnp.broadcast_to(jnp.linspace(0.0, 0.999, 16)[None], (2, 16))
    s = np.asarray(sample_pdf(bins, cdf, u))
    np.testing.assert_allclose(s[0], np.linspace(0, 0.999, 16), atol=1e-5)


def test_error_bound_sampler_concentrates_on_surface():
    """Rays through an analytic sphere SDF: final samples should cluster near
    the two surface crossings."""
    R = 8
    dirs = jnp.zeros((R, 3)).at[:, 2].set(1.0)
    cam = jnp.zeros((R, 3)).at[:, 2].set(-2.0)

    def sdf_fn(pts):
        return jnp.linalg.norm(pts, axis=-1) - 0.5

    cfg = SamplerConfig(
        N_samples=32, N_samples_eval=32, N_samples_extra=8,
        max_total_iters=3, beta_iters=5, scene_bounding_sphere=3.0,
    )
    z = error_bound_z_vals(
        jax.random.PRNGKey(0), sdf_fn, dirs, cam, jnp.asarray(0.01), cfg,
        training=False,
    )
    z = np.asarray(z)
    assert z.shape == (R, 32 + 2 + 8)
    assert np.all(np.diff(z, axis=1) >= 0)
    # surface crossings at z = 1.5 and 2.5 from the camera
    near_surface = np.abs(z - 1.5).min(axis=1)
    assert np.all(near_surface < 0.05), near_surface
    frac_near = (np.abs(z - 1.5) < 0.2).mean() + (np.abs(z - 2.5) < 0.2).mean()
    assert frac_near > 0.5  # most samples concentrate at the two crossings


def test_inverse_sphere_z_and_depth2pts():
    z = inverse_sphere_z_vals(None, 4, 8, training=False)
    assert z.shape == (4, 8)
    ray_o = jnp.zeros((4, 8, 3)).at[..., 2].set(-2.0)
    ray_d = jnp.zeros((4, 8, 3)).at[..., 2].set(1.0)
    depth = jnp.flip(z, axis=-1) * (1 / 3.0)
    pts = depth2pts_outside(ray_o, ray_d, depth, 3.0)
    assert pts.shape == (4, 8, 4)
    # unit direction part
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pts[..., :3]), axis=-1), 1.0, atol=1e-5
    )


def test_signed_distance_to_mesh_cube():
    # unit cube [0,1]^3 as 12 triangles
    from itertools import product

    corners = np.array(list(product([0.0, 1.0], repeat=3)))
    faces = []
    # brute force: triangulate each axis-aligned face
    quads = [
        [0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
        [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3],
    ]
    for q in quads:
        faces += [[q[0], q[1], q[2]], [q[0], q[2], q[3]]]
    faces = np.array(faces)

    pts = jnp.asarray(
        [[0.5, 0.5, 0.5], [0.5, 0.5, 1.3], [2.0, 0.5, 0.5], [0.5, 0.5, 0.9]],
        jnp.float32,
    )
    sd = np.asarray(
        signed_distance_to_mesh(pts, jnp.asarray(corners, jnp.float32),
                                jnp.asarray(faces))
    )
    np.testing.assert_allclose(sd, [-0.5, 0.3, 1.0, -0.1], atol=1e-5)


def test_min_vertex_dist_pallas_matches_xla():
    from hold_tpu.ops.point_mesh import min_vertex_dist, min_vertex_dist_pallas

    rng = np.random.RandomState(7)
    pts = jnp.asarray(rng.randn(3000, 3).astype(np.float32))
    verts = jnp.asarray(rng.randn(700, 3).astype(np.float32) * 0.5)
    a = min_vertex_dist(pts, verts)
    b = min_vertex_dist_pallas(pts, verts, interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_merge_factors_gradient_matches_numeric():
    """The scatter-free custom VJP of the depth sort must match finite
    differences (the backward inverts the permutation by re-sorting)."""
    from hold_tpu.render.volsdf import merge_factors

    R, S1, S2 = 7, 9, 11

    def mk(S, seed):
        r = np.random.RandomState(seed)
        return {
            "z_vals": jnp.asarray(np.sort(r.rand(R, S), 1), jnp.float32),
            "color": jnp.asarray(r.rand(R, S, 3), jnp.float32),
            "density": jnp.asarray(r.rand(R, S, 1), jnp.float32),
        }

    f1, f2 = mk(S1, 1), mk(S2, 2)

    def loss(c1, c2):
        g1 = dict(f1); g1["color"] = c1
        g2 = dict(f2); g2["color"] = c2
        m = merge_factors([g1, g2])
        return (jnp.sum(m["color"] ** 2 * m["density"])
                + jnp.sum(m["z_vals"] * 0.1))

    g = jax.grad(loss, argnums=(0, 1))(f1["color"], f2["color"])
    eps = 1e-3
    for idx in [(3, 4, 1), (0, 0, 0), (6, 8, 2)]:
        c1 = np.asarray(f1["color"]).copy()
        c1p = c1.copy(); c1p[idx] += eps
        c1m = c1.copy(); c1m[idx] -= eps
        num = (loss(jnp.asarray(c1p), f2["color"])
               - loss(jnp.asarray(c1m), f2["color"])) / (2 * eps)
        assert abs(float(g[0][idx]) - float(num)) < 1e-2, idx
