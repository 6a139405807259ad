"""SDF -> density transforms (VolSDF Laplace CDF, NeRF++ abs, NeRF relu).

Parity with code/src/engine/density.py:5-47; the Laplace beta is a learnable
scalar living in the parameter pytree.
"""

from __future__ import annotations

import jax.numpy as jnp


def init_laplace_density(params_init: dict, beta_min: float = 1e-4) -> dict:
    # strong float32 — a weak-typed scalar here flips dtype promotion after
    # the first optimizer update and forces a silent train-step recompile
    return {"beta": jnp.asarray(float(params_init.get("beta", 0.1)), jnp.float32)}


def laplace_beta(params: dict, beta_min: float = 1e-4) -> jnp.ndarray:
    return jnp.abs(params["beta"]) + beta_min


def laplace_density(
    params: dict, sdf: jnp.ndarray, beta: jnp.ndarray | None = None,
    beta_min: float = 1e-4,
) -> jnp.ndarray:
    """alpha * Laplace(0, beta).cdf(-sdf) with alpha = 1/beta."""
    if beta is None:
        beta = laplace_beta(params, beta_min)
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


def abs_density(sdf: jnp.ndarray) -> jnp.ndarray:
    """NeRF++-style background density (raw field output -> |.|)."""
    return jnp.abs(sdf)


def simple_density(sdf: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(sdf, 0.0)
