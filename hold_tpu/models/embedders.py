"""Positional encodings: NeRF Fourier + BARF coarse-to-fine annealing.

TPU-first re-design of the reference's embedders
(code/src/engine/embedders.py:7-160): instead of a stateful per-step counter
mutated on the host (`BarfEmbedder.step`), the BARF annealing coefficient is a
*traced* function of the global step, so the whole schedule lives inside one
compiled train step and never triggers recompilation.

Layout parity: embed(x) = [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{L-1} x),
cos(2^{L-1} x)] with log-spaced frequencies; BARF weights multiply the sin/cos
blocks per frequency (identity passthrough for the raw-input block).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def embed_dim(input_dims: int, num_freq: int, include_input: bool = True) -> int:
    return input_dims * (2 * num_freq + (1 if include_input else 0))


def fourier_embed(
    x: jnp.ndarray, num_freq: int, include_input: bool = True
) -> jnp.ndarray:
    """(..., D) -> (..., embed_dim). Frequencies 2^0 .. 2^{L-1}."""
    freqs = 2.0 ** jnp.arange(num_freq, dtype=x.dtype)
    # (..., L, D)
    xf = x[..., None, :] * freqs[:, None]
    enc = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)  # (..., L, 2D)
    enc = enc.reshape(x.shape[:-1] + (num_freq * 2 * x.shape[-1],))
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def barf_alpha(step: jnp.ndarray, num_freq: int, start: int, end: int) -> jnp.ndarray:
    """Annealing coefficient alpha(step) in [0, L].

    Parity with code/src/engine/embedders.py:74-109: zero for `start` steps,
    then linear from 0 to L over (end - start) steps, clamped at the last
    table entry.
    """
    denom = max(end - start - 1, 1)
    it = jnp.clip(step - start, 0, denom)
    return num_freq * it.astype(jnp.float32) / denom


def barf_weights(alpha: jnp.ndarray, num_freq: int) -> jnp.ndarray:
    """Per-frequency window weights (L,), cosine-eased in the active band."""
    k = jnp.arange(num_freq, dtype=jnp.float32)
    ak = alpha - k
    w = jnp.clip(ak, 0.0, 1.0)
    cos_val = (1.0 - jnp.cos(jnp.clip(ak, 0.0, 1.0) * np.pi)) / 2.0
    in_band = jnp.logical_and(ak >= 0.0, ak < 1.0)
    return jnp.where(in_band, cos_val, w)


def barf_embed(
    x: jnp.ndarray,
    num_freq: int,
    alpha: jnp.ndarray | None,
    include_input: bool = True,
) -> jnp.ndarray:
    """Fourier embedding with BARF annealing. alpha=None disables annealing
    (eval mode — reference's `no_barf`/eval behaviour)."""
    enc = fourier_embed(x, num_freq, include_input=include_input)
    if alpha is None:
        return enc
    D = x.shape[-1]
    w_freq = barf_weights(alpha, num_freq)  # (L,)
    # weight layout: [ones(D) | per-freq block of 2D]
    w_blocks = jnp.repeat(w_freq, 2 * D)
    if include_input:
        w_full = jnp.concatenate([jnp.ones((D,), w_blocks.dtype), w_blocks])
    else:
        w_full = w_blocks
    return enc * w_full


def make_embedder(mode: str, num_freq: int, barf_s: int = 0, barf_e: int = 1):
    """Returns embed_fn(x, step_or_none) closed over static config.

    mode: 'fourier' (no annealing) or 'barf' (annealed by global step).
    Passing step=None always disables annealing (eval parity with
    code/render.py:43-47).
    """
    if mode == "fourier":
        def fn(x, step=None):
            return fourier_embed(x, num_freq)
        return fn
    elif mode == "barf":
        def fn(x, step=None):
            alpha = None if step is None else barf_alpha(step, num_freq, barf_s, barf_e)
            return barf_embed(x, num_freq, alpha)
        return fn
    raise ValueError(f"unknown embedder mode {mode}")
