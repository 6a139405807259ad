"""Stochastic point sampling around meshes/vertex sets (loss-target prep).

JAX ports of the reference's PointInSpace sampler and barycentric surface
sampling (code/src/hold/hold_utils.py:22-55, 274-303) — pure functions of an
explicit PRNG key, so they live inside the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_in_space_sample(
    rng: jax.Array,
    pc_input: jnp.ndarray,  # (B, N, 3) sampling centers
    local_sigma: float,
    global_sigma_xyz,  # (3,) box half-extents for the uniform part
    global_ratio: float = 0.125,
) -> jnp.ndarray:
    """One gaussian-jittered sample per center + uniform box samples.

    Output (B, N + int(N * global_ratio), 3)."""
    k1, k2 = jax.random.split(rng)
    B, N, D = pc_input.shape
    local = pc_input + jax.random.normal(k1, pc_input.shape) * local_sigma
    n_glob = int(N * global_ratio)
    g = jnp.asarray(global_sigma_xyz, pc_input.dtype)
    glob = jax.random.uniform(k2, (B, n_glob, D)) * (2.0 * g) - g
    return jnp.concatenate([local, glob], axis=1)


def sample_on_mesh_barycentric(
    rng: jax.Array,
    verts: jnp.ndarray,  # (B, V, 3)
    faces: jnp.ndarray,  # (F, 3) int
    num_samples: int,
) -> jnp.ndarray:
    """Uniform-per-face barycentric surface samples, (B, num_samples, 3)."""
    B = verts.shape[0]
    kf, ku, kv = jax.random.split(rng, 3)
    F = faces.shape[0]
    fidx = jax.random.randint(kf, (B, num_samples), 0, F)
    tri = faces[fidx]  # (B, S, 3)
    v0 = jnp.take_along_axis(verts, tri[..., 0:1], axis=1)
    v1 = jnp.take_along_axis(verts, tri[..., 1:2], axis=1)
    v2 = jnp.take_along_axis(verts, tri[..., 2:3], axis=1)
    u = jax.random.uniform(ku, (B, num_samples, 1))
    v = jax.random.uniform(kv, (B, num_samples, 1))
    flip = (u + v) > 1.0
    u = jnp.where(flip, 1.0 - u, u)
    v = jnp.where(flip, 1.0 - v, v)
    return u * v0 + v * v1 + (1.0 - u - v) * v2


# Hand-region box half-extents for eikonal/global samples — the empirical
# canonical-hand bounding box the reference hard-codes (hold_utils.py:58).
HAND_GLOBAL_SIGMA_XYZ = (0.15, 0.06, 0.12)
