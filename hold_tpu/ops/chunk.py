"""Chunked point-wise mapping: bound the size of compiled fusions.

The TPU compiler's fusion pass crashes (SIGILL in its cost model) when the
transposed (backward) graph of the 8x256 SDF MLP spans more than ~2e5 points
in one fusion.  `map_chunked` splits a flat point axis into fixed chunks and
runs the body under `lax.map`, so both the forward and the scan-transposed
backward are bounded per step while remaining a single compiled loop.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# < the ~2e5-point transposed-fusion crash threshold; HOLD_SHADE_CHUNK
# overrides for A/B runs (bigger chunks = fewer boundaries, larger fusions)
DEFAULT_CHUNK = int(os.environ.get("HOLD_SHADE_CHUNK", 32768))


def map_chunked(body, args: tuple, n: int, chunk: int = DEFAULT_CHUNK,
                remat: bool = False, unroll: bool = True):
    """Apply ``body(*chunk_args) -> pytree of (C, ...)`` over a flat axis.

    args: tuple of arrays with leading dim n.  Returns outputs with leading
    dim n.  If n <= chunk the body is called directly (no scan).
    remat=True rematerialises the body in the backward pass (stores only
    chunk inputs + values tagged jax.ad_checkpoint.checkpoint_name) — trades
    recompute for ~8x lower HBM residency of the MLP activations.

    unroll=True emits the chunks as straight-line HLO instead of a lax.map:
    measured on-chip, GEMM chains inside a scan body run ~3x slower than the
    identical unrolled code (the scan's traced index defeats XLA's
    scheduling; see ray_sampler.upsample_round).  Each chunk keeps its own
    jax.checkpoint boundary, so backward fusions stay chunk-sized — the
    fusion-pass size limit that motivated chunking is still respected."""
    if remat:
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names("saved"),
        )
    if n <= chunk:
        return body(*args)

    pad = (-n) % chunk
    padded = tuple(
        jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        if pad else a
        for a in args
    )
    if unroll:
        n_chunks = padded[0].shape[0] // chunk
        outs = [
            body(*(a[i * chunk:(i + 1) * chunk] for a in padded))
            for i in range(n_chunks)
        ]
        out = jax.tree_util.tree_map(
            lambda *os: jnp.concatenate(os, axis=0), *outs
        )
        return jax.tree_util.tree_map(lambda o: o[:n], out)

    stacked = tuple(a.reshape((-1, chunk) + a.shape[1:]) for a in padded)
    out = jax.lax.map(lambda xs: body(*xs), stacked)
    return jax.tree_util.tree_map(
        lambda o: o.reshape((-1,) + o.shape[2:])[:n], out
    )
