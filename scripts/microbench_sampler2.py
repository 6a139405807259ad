"""Ablate the object sampler's cost: rounds, bisection, sorts.

Variants of error_bound_z_vals via SamplerConfig tweaks + query swaps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    from hold_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.data.synthetic import generate_sequence
    from hold_tpu.models.holdnet import (
        build_scene, get_camera_rays, init_scene_params,
    )
    from hold_tpu.models.mlp import apply_implicit_net
    from hold_tpu.models.nodes import _bf16_tree, gather_object_pose
    from hold_tpu.models.object_model import object_deform, object_server_forward
    from hold_tpu.render.ray_sampler import error_bound_z_vals
    from hold_tpu.utils.config import load_config

    R = 1280
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data")
    case = "bench_seq"
    if not os.path.exists(os.path.join(root, case, "build", "data.npy")):
        generate_sequence(root + "/" + case, n_frames=10, img_hw=(240, 320))
    seq = SequenceData(case, root, num_sample=R // 10)
    cfg = load_config()
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    scene = build_scene(opt, {"barf_s": 1000, "barf_e": 10000}, seq.scene_data())
    params = init_scene_params(jax.random.PRNGKey(0), scene, seq.scene_data())

    rngnp = np.random.RandomState(0)
    batch_np = seq.sample_tempo_batch(rngnp, batch_size=5, num_sample=R // 10)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    ray_dirs_b, cam_loc_b = get_camera_rays(
        batch["uv"], batch["extrinsics"], batch["intrinsics"])
    B, P = batch["uv"].shape[:2]
    ray_dirs = ray_dirs_b.reshape(-1, 3)
    cam_loc = jnp.broadcast_to(cam_loc_b[:, None, :], (B, P, 3)).reshape(-1, 3)
    key = jax.random.PRNGKey(0)
    scfg = scene.sampler_cfg

    pose = gather_object_pose(params["object"]["tables"], batch["frame_idx"])
    srv_out = object_server_forward(
        scene.servers["object"], jnp.broadcast_to(batch["scene_scale"], (B,)),
        pose["transl"], pose["global_orient"],
        obj_scale=params["object"].get("obj_scale"))
    tfs = jax.device_get(srv_out.obj_tfs)
    tfs = jnp.asarray(tfs)
    imp_bf = _bf16_tree(jax.device_get(params["object"]["implicit"]))
    imp_bf = jax.tree_util.tree_map(jnp.asarray, imp_bf)

    def mlp_query(pts_RS3):
        S = pts_RS3.shape[1]
        pts = pts_RS3.reshape(B, (R // B) * S, 3)
        xc = object_deform(pts, tfs, inverse=True)
        out = apply_implicit_net(
            imp_bf, scene.plans["object"].implicit,
            xc.reshape(-1, 3).astype(jnp.bfloat16),
            jnp.zeros((R * S, 0), jnp.bfloat16),
            step=jnp.asarray(0), barf_cfg=scene.plans["object"].barf_cfg)
        return out[:, 0].astype(jnp.float32).reshape(R, S)

    def run(cfg_v, name):
        f = jax.jit(lambda rd, cl, k: error_bound_z_vals(
            k, mlp_query, rd, cl, jnp.asarray(0.01), cfg_v, True))
        ms = timeit(f, ray_dirs, cam_loc, key)
        print(f"{name:36s} {ms:7.1f} ms", flush=True)
        return ms

    run(scfg, "full (5 rounds, 10 beta_iters)")
    run(scfg._replace(max_total_iters=1), "1 round")
    run(scfg._replace(max_total_iters=2), "2 rounds")
    run(scfg._replace(max_total_iters=3), "3 rounds")
    run(scfg._replace(beta_iters=1), "5 rounds, 1 beta_iter")
    run(scfg._replace(N_samples_extra=0), "no extras")


if __name__ == "__main__":
    main()
