"""Throughput-vs-rays scaling probe on the real chip.

Measures sampler-stage and grad-stage wall time per step at several ray-batch
shapes (reference default is 1,280 rays/step: code/src/utils/parser.py:26-30)
to find the chip's saturation point.  Informs bench.py's headline shape.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_samples", type=int, nargs="+",
                    default=[128, 512, 2048])
    ap.add_argument("--batch_size", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from hold_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.data.synthetic import generate_sequence
    from hold_tpu.models.holdnet import (
        build_scene, empty_object_mesh_state, init_scene_params,
    )
    from hold_tpu.train import make_train_step, optimizer_for
    from hold_tpu.utils.config import Cfg, load_config

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    case = "bench_seq"
    if not os.path.exists(os.path.join(root, case, "build", "data.npy")):
        generate_sequence(os.path.join(root, case), n_frames=10,
                          img_hw=(240, 320))

    seq = SequenceData(case, root, num_sample=max(args.num_samples))
    cfg = load_config()
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    scene = build_scene(opt, {"barf_s": 1000, "barf_e": 10000},
                        seq.scene_data())
    params0 = init_scene_params(jax.random.PRNGKey(0), scene, seq.scene_data())
    mesh_state = empty_object_mesh_state()

    targs = Cfg({"lr": 1e-4, "freeze_pose": False})
    tx = optimizer_for(targs, params0)

    from hold_tpu.models.holdnet import sample_all_z, holdnet_forward
    from hold_tpu.models.losses import compute_losses
    import optax

    sample_fn = jax.jit(
        lambda params, batch, key, step, epoch: sample_all_z(
            params, scene, batch, key, step, epoch, training=True))

    def step_fn(params, opt_state, batch, mesh_state, z_vals, key, step, epoch):
        def loss_fn(p):
            out = holdnet_forward(
                p, scene, batch, mesh_state, key, step, epoch, training=True,
                z_vals_dict=z_vals)
            losses = compute_losses(batch, out, scene.node_ids, step)
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    grad_fn = jax.jit(step_fn, donate_argnums=(0, 1))

    results = []
    for ns in args.num_samples:
        params = jax.tree.map(jnp.copy, params0)
        opt_state = tx.init(params)
        rng = np.random.RandomState(0)
        batch_np = seq.sample_tempo_batch(rng, batch_size=args.batch_size,
                                          num_sample=ns)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        rays = batch_np["uv"].shape[0] * batch_np["uv"].shape[1]
        key = jax.random.PRNGKey(0)
        try:
            t0 = time.time()
            k1, k2 = jax.random.split(key)
            z = sample_fn(params, batch, k1, jnp.asarray(0), jnp.asarray(0))
            jax.block_until_ready(z)
            t_compile_s = time.time() - t0
            t0 = time.time()
            params, opt_state, aux = grad_fn(
                params, opt_state, batch, mesh_state, z, k2,
                jnp.asarray(0), jnp.asarray(0))
            jax.block_until_ready(aux["loss"])
            t_compile_g = time.time() - t0

            ts, tg = 0.0, 0.0
            for i in range(args.iters):
                key, k1, k2 = jax.random.split(key, 3)
                t0 = time.time()
                z = sample_fn(params, batch, k1, jnp.asarray(i + 1),
                              jnp.asarray(0))
                jax.block_until_ready(z)
                ts += time.time() - t0
                t0 = time.time()
                params, opt_state, aux = grad_fn(
                    params, opt_state, batch, mesh_state, z, k2,
                    jnp.asarray(i + 1), jnp.asarray(0))
                jax.block_until_ready(aux["loss"])
                tg += time.time() - t0
            ts /= args.iters
            tg /= args.iters
            rec = {
                "rays": rays, "num_sample": ns,
                "sampler_ms": round(ts * 1e3, 1),
                "grad_ms": round(tg * 1e3, 1),
                "step_ms": round((ts + tg) * 1e3, 1),
                "rays_per_sec": round(rays / (ts + tg), 1),
                "compile_s": round(t_compile_s + t_compile_g, 1),
            }
        except Exception as e:  # noqa: BLE001 — OOM/compiler probe
            rec = {"rays": rays, "num_sample": ns, "error": repr(e)[:300]}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"grid": results}))


if __name__ == "__main__":
    main()
