"""Worker for the REAL two-process multi-host test (tests/test_multihost.py).

Each process initialises jax.distributed with 4 local CPU devices (8 global),
builds the shared 8-device mesh, shards the identical host batch, runs one
jitted global-sum reduction, and writes a JSON report the parent asserts on.

Run (by the test, twice):
  python tests/multihost_worker.py <coordinator> <num_procs> <pid> <out.json>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    coordinator, num_procs, pid, out_p = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    from hold_tpu.parallel.sharding import (
        init_distributed,
        make_mesh,
        shard_batch,
    )

    init_distributed(coordinator, num_procs, pid)
    assert jax.process_count() == num_procs, jax.process_count()

    import jax.numpy as jnp
    import numpy as np

    # identical global batch on every process (seeded rng), as train.py does
    rng = np.random.RandomState(3)
    batch = {
        "uv": rng.rand(2, 16, 2).astype(np.float32),
        "gt_rgb": rng.rand(32, 3).astype(np.float32),
        "gt_mask": (rng.rand(32) > 0.5).astype(np.float32),
        "frame_idx": np.arange(2, dtype=np.int32),
        "intrinsics": rng.rand(2, 4, 4).astype(np.float32),
        "extrinsics": rng.rand(2, 4, 4).astype(np.float32),
        "scene_scale": np.float32(1.5),
    }

    mesh = make_mesh()
    assert mesh.devices.size == 4 * num_procs, mesh.devices
    with mesh:
        sharded = shard_batch(batch, mesh)

        # each process holds only its local shards
        def shard_ranges(k, v):
            ax = 1 if k == "uv" else 0
            n = batch[k].shape[ax]
            out = []
            for s in v.addressable_shards:
                start, stop, _ = s.index[ax].indices(n)
                out.append([[int(start), int(stop)],
                            float(np.asarray(s.data).sum())])
            return sorted(out)

        local_shards = {
            k: shard_ranges(k, v)
            for k, v in sharded.items() if k in ("gt_rgb", "uv")
        }

        # a global jitted reduction must see the FULL batch on every process
        @jax.jit
        def global_sums(b):
            return (
                jnp.sum(b["gt_rgb"]),
                jnp.sum(b["uv"]),
                jnp.sum(b["gt_mask"]),
            )

        sums = [float(x) for x in global_sums(sharded)]

    report = {
        "pid": pid,
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": len(jax.devices()),
        "sums": sums,
        "expected_sums": [
            float(batch["gt_rgb"].sum()),
            float(batch["uv"].sum()),
            float(batch["gt_mask"].sum()),
        ],
        "local_shards": local_shards,
    }
    with open(out_p, "w") as f:
        json.dump(report, f)
    print("worker", pid, "ok")


if __name__ == "__main__":
    main()
