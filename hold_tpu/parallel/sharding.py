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


def init_distributed(coordinator: str = "", num_processes: int = 0,
                     process_id: int = -1) -> None:
    """Multi-host entry: one JAX process per host, devices pooled into the
    global mesh (pod slices reach each other over ICI; inter-slice over DCN).
    Must run before any other JAX call.  No-op when no coordinator is given,
    so single-host flows never pay for it."""
    if not coordinator:
        return
    kwargs = {"coordinator_address": coordinator}
    if num_processes:
        kwargs["num_processes"] = num_processes
    if process_id >= 0:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(num_devices: int = 0) -> Mesh:
    devs = jax.devices()  # global across processes after init_distributed
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
    """Commit a host batch to the mesh.

    Single-process: a plain device_put.  Multi-host (process_count > 1):
    every process draws the identical global batch (the numpy rng is seeded
    identically), and each materialises only the shards its local devices
    own via make_array_from_callback — no cross-host transfer."""
    shardings = batch_shardings(mesh)
    multi = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        s = shardings.get(k, NamedSharding(mesh, P()))
        arr = np.asarray(v)
        if multi:
            out[k] = jax.make_array_from_callback(
                arr.shape, s, lambda idx, a=arr: a[idx]
            )
        else:
            out[k] = jax.device_put(jax.numpy.asarray(arr), s)
    return out


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_render_chunk(batch: dict, mesh: Mesh) -> dict:
    """Commit an inference chunk to the mesh: pixel axis of ``uv`` sharded,
    per-frame fields (cameras, frame index) replicated.

    Used by the chunk renderer so full-frame validation/eval renders scale
    with devices the same way the train step does (the reference's chunked
    inference at code/src/datasets/utils.py:309-341 is single-GPU)."""
    out = {}
    for k, v in batch.items():
        spec = P(None, "data") if k == "uv" else P()
        out[k] = jax.device_put(jax.numpy.asarray(v), NamedSharding(mesh, spec))
    return out
