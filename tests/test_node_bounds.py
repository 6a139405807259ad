"""Per-node ray-interval tightening (FLOP diet, no reference counterpart:
the reference samples every node over the full scene range,
code/src/engine/ray_sampler.py:139-141).

node_ray_interval clips each ray's [near, far] to its intersection with the
node's bounding sphere; rays that miss collapse to a degenerate interval at
the scene exit so their samples contribute ~zero density.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hold_tpu.render.ray_sampler import (
    SamplerConfig,
    error_bound_z_vals,
    node_ray_interval,
)


def _cfg(**kw):
    d = dict(
        scene_bounding_sphere=3.0,
        near=0.0,
        N_samples=16,
        N_samples_eval=32,
        N_samples_extra=8,
        eps=0.1,
        beta_iters=4,
        max_total_iters=2,
        inverse_sphere_bg=True,
    )
    d.update(kw)
    return SamplerConfig(**d)


def test_interval_matches_analytic_sphere_intersection():
    cfg = _cfg()
    cam = jnp.zeros((3, 3))
    dirs = jnp.asarray(
        [[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], jnp.float32
    )
    # sphere at z=2, r=0.5: ray0 hits [1.5, 2.5]; ray1 same sphere; ray2
    # points along +x and misses entirely
    center = jnp.asarray([[0, 0, 2.0]] * 3, jnp.float32)
    radius = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    near, far = node_ray_interval(cam, dirs, center, radius, cfg)
    np.testing.assert_allclose(near[0, 0], 1.5, atol=1e-5)
    np.testing.assert_allclose(far[0, 0], 2.5, atol=1e-5)
    # miss: degenerate interval at the scene exit (|near| == |far| == exit)
    scene_exit = 3.0  # unit dir from origin exits the r=3 sphere at t=3
    np.testing.assert_allclose(near[2, 0], scene_exit, atol=1e-4)
    np.testing.assert_allclose(far[2, 0], scene_exit, atol=1e-4)


def test_interval_clipped_to_scene_sphere():
    cfg = _cfg()
    cam = jnp.zeros((1, 3))
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    # giant node sphere: interval must still end at the scene exit
    center = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    radius = jnp.asarray([50.0], jnp.float32)
    near, far = node_ray_interval(cam, dirs, center, radius, cfg)
    assert float(far[0, 0]) <= 3.0 + 1e-4
    assert float(near[0, 0]) >= 0.0


def test_sampler_respects_per_ray_near_far():
    cfg = _cfg()
    R = 4
    rng = jax.random.PRNGKey(0)
    cam = jnp.zeros((R, 3))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (R, 1))
    near = jnp.asarray([[0.5], [1.0], [1.5], [2.0]], jnp.float32)
    far = near + 0.4

    def sdf_fn(pts):  # plane at z=2 -> surface inside some intervals
        return pts[..., 2] - 2.0

    def query_z(z):
        pts = cam[:, None] + z[..., None] * dirs[:, None]
        return sdf_fn(pts)

    z = error_bound_z_vals(
        rng, None, dirs, cam, jnp.asarray(0.05), cfg, True,
        query_z_fn=query_z, near=near, far=far,
    )
    assert z.shape[0] == R
    zmin = np.asarray(z.min(axis=1))
    zmax = np.asarray(z.max(axis=1))
    np.testing.assert_array_less(np.asarray(near[:, 0]) - 1e-4, zmin)
    np.testing.assert_array_less(zmax, np.asarray(far[:, 0]) + 1e-4)


def test_default_near_far_unchanged_without_override():
    """No-override call = reference full-range behavior (regression)."""
    cfg = _cfg()
    R = 2
    rng = jax.random.PRNGKey(1)
    cam = jnp.zeros((R, 3))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (R, 1))

    def query_z(z):
        pts = cam[:, None] + z[..., None] * dirs[:, None]
        return pts[..., 2] - 1.0

    z_a = error_bound_z_vals(
        rng, None, dirs, cam, jnp.asarray(0.05), cfg, False, query_z_fn=query_z
    )
    z_b = error_bound_z_vals(
        rng, None, dirs, cam, jnp.asarray(0.05), cfg, False,
        query_z_fn=query_z, near=None, far=None,
    )
    np.testing.assert_allclose(np.asarray(z_a), np.asarray(z_b))
