"""Bisect the 20,480-ray TPU compiler crash: compile each stage separately.

Usage: python scripts/repro_20k.py [sampler|grad|both] [--rays N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", nargs="?", default="both")
    ap.add_argument("--rays", type=int, default=20480)
    args = ap.parse_args()

    from hold_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import numpy as np

    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.models.holdnet import (
        build_scene, empty_object_mesh_state, init_scene_params,
        holdnet_forward, sample_all_z,
    )
    from hold_tpu.models.losses import compute_losses
    from hold_tpu.train import optimizer_for
    from hold_tpu.utils.config import Cfg, load_config

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data")
    seq = SequenceData("bench_seq", root, num_sample=128)
    cfg = load_config()
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    scene = build_scene(opt, {"barf_s": 1000, "barf_e": 10000}, seq.scene_data())
    params = init_scene_params(jax.random.PRNGKey(0), scene, seq.scene_data())
    mesh_state = empty_object_mesh_state()
    tx = optimizer_for(Cfg({"lr": 1e-4, "freeze_pose": False}), params)
    opt_state = tx.init(params)

    rng = np.random.RandomState(0)
    batch_np = seq.sample_tempo_batch(
        rng, batch_size=5, num_sample=args.rays // 10)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)

    sample_fn = jax.jit(
        lambda p, b, k, s, e: sample_all_z(p, scene, b, k, s, e, training=True)
    )

    def step_fn(p, os_, b, ms, z, k, s, e):
        import optax

        def loss_fn(pp):
            out = holdnet_forward(pp, scene, b, ms, k, s, e, training=True,
                                  z_vals_dict=z)
            losses = compute_losses(b, out, scene.node_ids, s)
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(pp := p)
        updates, os_ = tx.update(grads, os_, pp)
        import optax as ox
        return ox.apply_updates(pp, updates), os_, aux

    if args.stage in ("sampler", "both"):
        print("compiling sampler ...", flush=True)
        z = sample_fn(params, batch, key, jnp.asarray(0), jnp.asarray(0))
        jax.block_until_ready(z)
        print("sampler OK", flush=True)
    if args.stage in ("grad", "both"):
        print("compiling grad ...", flush=True)
        if args.stage == "grad":
            z = sample_fn(params, batch, key, jnp.asarray(0), jnp.asarray(0))
        grad_fn = jax.jit(step_fn, donate_argnums=(0, 1))
        params, opt_state, aux = grad_fn(
            params, opt_state, batch, mesh_state, z, key,
            jnp.asarray(0), jnp.asarray(0))
        jax.block_until_ready(aux["loss"])
        print("grad OK, loss", float(aux["loss"]), flush=True)


if __name__ == "__main__":
    main()
