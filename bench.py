"""Benchmark: training-step rays/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference publishes no throughput numbers (BASELINE.md).
We anchor vs_baseline to an estimated PyTorch-reference training rate of
3,500 rays/s on a single A100-class GPU, derived from the reference's default
budget (80k steps x 1,280 rays/step, code/src/utils/parser.py:26-30,87-89)
and a ~8h wall-clock for the default 200-epoch run.  Until a measured torch
baseline exists this is an estimate, clearly labelled here.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ASSUMED_BASELINE_RAYS_PER_SEC = 3500.0


def main():
    from hold_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.data.synthetic import generate_sequence
    from hold_tpu.models.holdnet import (
        build_scene,
        empty_object_mesh_state,
        init_scene_params,
    )
    from hold_tpu.train import make_train_step, optimizer_for
    from hold_tpu.utils.config import Cfg, load_config

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
    case = "bench_seq"
    if not os.path.exists(os.path.join(root, case, "build", "data.npy")):
        generate_sequence(os.path.join(root, case), n_frames=10, img_hw=(240, 320))

    # reference-default training shape: batch 5 pairs -> 10 frames x 128 rays
    seq = SequenceData(case, root, num_sample=128)
    cfg = load_config()
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    scene = build_scene(opt, {"barf_s": 1000, "barf_e": 10000}, seq.scene_data())
    params = init_scene_params(jax.random.PRNGKey(0), scene, seq.scene_data())
    mesh_state = empty_object_mesh_state()

    args = Cfg({"lr": 1e-4, "freeze_pose": False})
    tx = optimizer_for(args, params)
    opt_state = tx.init(params)
    train_step = make_train_step(scene, tx)

    rng = np.random.RandomState(0)
    batch_np = seq.sample_tempo_batch(rng, batch_size=5, num_sample=128)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rays = batch_np["uv"].shape[0] * batch_np["uv"].shape[1]

    key = jax.random.PRNGKey(0)
    # compile + warmup
    params, opt_state, aux = train_step(
        params, opt_state, batch, mesh_state, key, jnp.asarray(0), jnp.asarray(0)
    )
    jax.block_until_ready(aux["loss"])

    iters = 10
    t0 = time.time()
    for i in range(iters):
        key, sub = jax.random.split(key)
        params, opt_state, aux = train_step(
            params, opt_state, batch, mesh_state, sub,
            jnp.asarray(i + 1), jnp.asarray(0),
        )
    jax.block_until_ready(aux["loss"])
    dt = (time.time() - t0) / iters

    rays_per_sec = rays / dt
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / ASSUMED_BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
