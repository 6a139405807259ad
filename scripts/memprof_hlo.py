"""Attribute grad-stage HBM to tensor shapes from the optimized HLO text.

Parses the compiled module (after-optimizations HLO) of the train grad stage
and histograms instruction output shapes by total bytes, which identifies
the dominant buffer families even without a buffer-assignment dump (the
tunneled TPU backend compiles server-side, so --xla_dump_to is unavailable).

Usage: python scripts/memprof_hlo.py [total_rays] [top_n]
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hold_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
import numpy as np

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}


def shape_bytes(shape_str: str) -> int:
    """'f32[123,456]{1,0}' -> bytes (0 for tuples/tokens)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    if dt not in DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES[dt]


def main():
    total_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 10240
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40

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
    z_shape = jax.eval_shape(
        lambda *a: sample_all_z(a[0], scene, a[1], a[2], a[3], a[4],
                                training=True),
        params0, batch, key, jnp.asarray(0), jnp.asarray(0))
    z = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), z_shape)
    cg = grad_fn.lower(params0, opt_state, batch, mesh_state, z, key,
                       jnp.asarray(0), jnp.asarray(0)).compile()
    print("memory:", cg.memory_analysis())
    txt = cg.as_text()
    out_path = "/tmp/grad_hlo.txt"
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"HLO written to {out_path} ({len(txt)/1e6:.1f} MB)")

    # histogram instruction output shapes >= 16 MB by (shape) family
    fam = defaultdict(lambda: [0, 0])
    for line in txt.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = ([\w\[\],{}\s/#*]+?) (\w+)\(",
                     line)
        if not m:
            continue
        shape_str, opname = m.groups()
        b = shape_bytes(shape_str.strip())
        if b >= 16 * 2**20:
            key2 = (shape_str.strip().split("{")[0], opname)
            fam[key2][0] += b
            fam[key2][1] += 1
    rows = sorted(fam.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"{'total GB':>9} {'count':>6}  shape / op")
    for (shape, opn), (b, c) in rows:
        print(f"{b/2**30:9.2f} {c:6d}  {shape}  {opn}")


if __name__ == "__main__":
    main()
