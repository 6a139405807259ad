"""Train-time metrics (PSNR) — parity with code/src/utils/metrics.py:6-35."""

from __future__ import annotations

import jax.numpy as jnp


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
