import jax
import numpy as np

from hold_tpu.parallel.sharding import batch_shardings, make_mesh, shard_batch


def test_mesh_and_batch_sharding():
    mesh = make_mesh(0)
    assert mesh.devices.size == 8
    batch = {
        "uv": np.zeros((2, 16, 2), np.float32),
        "gt_rgb": np.zeros((32, 3), np.float32),
        "gt_mask": np.zeros((32,), np.float32),
        "frame_idx": np.zeros((2,), np.int32),
        "intrinsics": np.zeros((2, 4, 4), np.float32),
        "extrinsics": np.zeros((2, 4, 4), np.float32),
        "scene_scale": np.float32(1.0),
    }
    with mesh:
        sharded = shard_batch(batch, mesh)
    # pixel axis split 8 ways
    assert sharded["uv"].sharding.shard_shape(sharded["uv"].shape) == (2, 2, 2)
    assert sharded["gt_rgb"].sharding.shard_shape((32, 3)) == (4, 3)
    # cameras replicated
    assert sharded["intrinsics"].sharding.shard_shape((2, 4, 4)) == (2, 4, 4)


def test_graft_dryrun_multichip():
    """The driver's multichip validation entry must pass on the 8-dev CPU mesh."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
