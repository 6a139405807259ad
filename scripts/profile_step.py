"""Profile the train step on the real chip: stage breakdown x ray-count grid.

Usage: python scripts/profile_step.py [--rays 1280,5120,20480] [--iters 10]
Prints per-shape: sampler ms, grad ms, total ms, rays/s.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", default="1280,5120,20480")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace", default="", help="jax.profiler trace dir")
    args = ap.parse_args()

    from hold_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")  # matches train.py
    import jax.numpy as jnp
    import numpy as np

    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.data.synthetic import generate_sequence
    from hold_tpu.models.holdnet import (
        build_scene, empty_object_mesh_state, init_scene_params, sample_all_z,
        holdnet_forward,
    )
    from hold_tpu.models.losses import compute_losses
    from hold_tpu.train import make_train_step, optimizer_for
    from hold_tpu.utils.config import Cfg, load_config

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data")
    case = "bench_seq"
    if not os.path.exists(os.path.join(root, case, "build", "data.npy")):
        generate_sequence(root + "/" + case, n_frames=10, img_hw=(240, 320))

    seq = SequenceData(case, root, num_sample=128)
    cfg = load_config()
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    scene = build_scene(opt, {"barf_s": 1000, "barf_e": 10000}, seq.scene_data())
    params0 = init_scene_params(jax.random.PRNGKey(0), scene, seq.scene_data())
    mesh_state = empty_object_mesh_state()

    targs = Cfg({"lr": 1e-4, "freeze_pose": False})
    tx = optimizer_for(targs, params0)

    sample_fn = jax.jit(
        lambda params, batch, key, step, epoch: sample_all_z(
            params, scene, batch, key, step, epoch, training=True
        )
    )

    def step_fn(params, opt_state, batch, mesh_state, z_vals, key, step, epoch):
        import optax

        def loss_fn(p):
            out = holdnet_forward(
                p, scene, batch, mesh_state, key, step, epoch, training=True,
                z_vals_dict=z_vals,
            )
            losses = compute_losses(batch, out, scene.node_ids, step)
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    grad_fn = jax.jit(step_fn, donate_argnums=(0, 1))

    rng = np.random.RandomState(0)
    results = []
    for total_rays in [int(x) for x in args.rays.split(",")]:
        num_sample = total_rays // 10  # batch of 5 pairs = 10 frames
        batch_np = seq.sample_tempo_batch(rng, batch_size=5, num_sample=num_sample)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        rays = batch_np["uv"].shape[0] * batch_np["uv"].shape[1]

        # grad_fn donates params/opt_state — work on a fresh copy per shape
        params = jax.tree_util.tree_map(lambda x: x.copy(), params0)
        opt_state = tx.init(params)
        key = jax.random.PRNGKey(0)

        # compile
        z = sample_fn(params, batch, key, jnp.asarray(0), jnp.asarray(0))
        jax.block_until_ready(z)
        params, opt_state, aux = grad_fn(
            params, opt_state, batch, mesh_state, z, key,
            jnp.asarray(0), jnp.asarray(0))
        jax.block_until_ready(aux["loss"])

        if args.trace:
            jax.profiler.start_trace(args.trace)

        t_s = t_g = 0.0
        t0 = time.time()
        for i in range(args.iters):
            key, k1, k2 = jax.random.split(key, 3)
            ta = time.time()
            z = sample_fn(params, batch, k1, jnp.asarray(i), jnp.asarray(0))
            jax.block_until_ready(z)
            tb = time.time()
            params, opt_state, aux = grad_fn(
                params, opt_state, batch, mesh_state, z, k2,
                jnp.asarray(i), jnp.asarray(0))
            jax.block_until_ready(aux["loss"])
            tc = time.time()
            t_s += tb - ta
            t_g += tc - tb
        dt = (time.time() - t0) / args.iters

        if args.trace:
            jax.profiler.stop_trace()

        r = dict(rays=rays, sampler_ms=1e3 * t_s / args.iters,
                 grad_ms=1e3 * t_g / args.iters, total_ms=1e3 * dt,
                 rays_per_s=rays / dt)
        results.append(r)
        print(f"rays={rays:6d}  sampler={r['sampler_ms']:7.1f}ms  "
              f"grad={r['grad_ms']:7.1f}ms  total={r['total_ms']:7.1f}ms  "
              f"{r['rays_per_s']:9.0f} rays/s", flush=True)

    best = max(results, key=lambda r: r["rays_per_s"])
    print(f"best: {best['rays_per_s']:.0f} rays/s at {best['rays']} rays/step")


if __name__ == "__main__":
    main()
