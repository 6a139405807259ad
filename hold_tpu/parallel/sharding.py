"""SPMD layer: device mesh + ray-axis sharding for the train step.

The reference is strictly single-GPU (SURVEY.md §2.5); this is the new
first-class TPU component.  The natural SPMD axis for per-sequence neural
rendering is the flat ray/pixel axis: every per-ray quantity (uv, gt rgb/mask,
samples, field queries) shards across the mesh, per-frame quantities (pose
tables, bone transforms, camera matrices) replicate, and the scalar loss
reduction makes XLA insert the gradient psum over ICI automatically.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0) -> Mesh:
    devs = jax.devices()
    if num_devices and num_devices < len(devs):
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ("data",))


def batch_shardings(mesh: Mesh) -> dict:
    """PartitionSpecs for a training batch: pixels sharded, cameras replicated."""
    return {
        "uv": NamedSharding(mesh, P(None, "data")),  # (B, P, 2)
        "gt_rgb": NamedSharding(mesh, P("data")),  # (B*P, 3)
        "gt_mask": NamedSharding(mesh, P("data")),  # (B*P,)
        "frame_idx": NamedSharding(mesh, P()),
        "intrinsics": NamedSharding(mesh, P()),
        "extrinsics": NamedSharding(mesh, P()),
        "scene_scale": NamedSharding(mesh, P()),
    }


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    shardings = batch_shardings(mesh)
    out = {}
    for k, v in batch.items():
        s = shardings.get(k, NamedSharding(mesh, P()))
        out[k] = jax.device_put(jax.numpy.asarray(v), s)
    return out


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_pixels_to_devices(batch: dict, n_devices: int) -> dict:
    """Pad the pixel axis so it divides the mesh size (eval-time chunks)."""
    P_pix = batch["uv"].shape[1]
    pad = (-P_pix) % n_devices
    if pad == 0:
        return batch
    out = dict(batch)
    out["uv"] = np.concatenate(
        [batch["uv"], np.repeat(batch["uv"][:, -1:], pad, axis=1)], axis=1
    )
    for k in ("gt_rgb", "gt_mask"):
        if k in batch:
            reps = np.repeat(batch[k][-1:], pad * batch["uv"].shape[0], axis=0)
            out[k] = np.concatenate([batch[k], reps], axis=0)
    return out
