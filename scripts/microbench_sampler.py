"""Decompose sampler-stage time: table machinery vs SDF MLP vs deformer.

Times error_bound_z_vals with
  (a) an analytic sphere SDF        -> pure table machinery cost
  (b) the real object MLP           -> + MLP cost
  (c) the real hand KNN+LBS+MLP     -> + deformer cost
and the raw MLP on the equivalent point count for reference.
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
    from hold_tpu.models.holdnet import build_scene, init_scene_params
    from hold_tpu.models.nodes import mano_node_sample_z, object_node_sample_z
    from hold_tpu.render.ray_sampler import error_bound_z_vals
    from hold_tpu.utils.config import load_config

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 1280

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
    from hold_tpu.models.holdnet import get_camera_rays

    ray_dirs_b, cam_loc_b = get_camera_rays(
        batch["uv"], batch["extrinsics"], batch["intrinsics"])
    B, P = batch["uv"].shape[:2]
    ray_dirs = ray_dirs_b.reshape(-1, 3)
    cam_loc = jnp.broadcast_to(cam_loc_b[:, None, :], (B, P, 3)).reshape(-1, 3)
    key = jax.random.PRNGKey(0)
    scfg = scene.sampler_cfg

    # (a) machinery only: analytic sphere
    @jax.jit
    def run_sphere(rd, cl, k):
        sdf = lambda pts: jnp.linalg.norm(pts, axis=-1) - 0.3
        return error_bound_z_vals(k, sdf, rd, cl, jnp.asarray(0.01), scfg, True)

    ms_a = timeit(run_sphere, ray_dirs, cam_loc, key)
    print(f"(a) machinery only (sphere sdf): {ms_a:7.1f} ms", flush=True)

    # (b) object node (rigid deform + MLP)
    @jax.jit
    def run_obj(p, b, rd, cl, k):
        return object_node_sample_z(
            p["object"], scene.servers["object"], scene.plans["object"],
            b, rd, cl, jnp.asarray(0), jnp.asarray(0), k, True)

    ms_b = timeit(run_obj, params, batch, ray_dirs, cam_loc, key)
    print(f"(b) object sampler (rigid+MLP):  {ms_b:7.1f} ms "
          f"(MLP+rigid ≈ {ms_b - ms_a:.1f})", flush=True)

    # (c) hand node (KNN + LBS + MLP)
    @jax.jit
    def run_hand(p, b, rd, cl, k):
        return mano_node_sample_z(
            p["right"], scene.servers["right"], scene.plans["right"],
            b, rd, cl, jnp.asarray(0), jnp.asarray(0), k, True)

    ms_c = timeit(run_hand, params, batch, ray_dirs, cam_loc, key)
    print(f"(c) hand sampler (KNN+LBS+MLP):  {ms_c:7.1f} ms "
          f"(deformer ≈ {ms_c - ms_b:.1f})", flush=True)

    # (d) raw MLP at the sampler's total point count
    from hold_tpu.models.mlp import apply_implicit_net
    n_pts = R * scfg.N_samples_eval * scfg.max_total_iters
    pts = jnp.asarray(rngnp.randn(n_pts, 3) * 0.2, jnp.bfloat16)
    from hold_tpu.models.nodes import _bf16_tree
    imp = _bf16_tree(params["object"]["implicit"])

    @jax.jit
    def run_mlp(ip, x):
        return apply_implicit_net(
            ip, scene.plans["object"].implicit, x,
            jnp.zeros((x.shape[0], 0), jnp.bfloat16),
            step=None, barf_cfg=scene.plans["object"].barf_cfg)[:, 0]

    ms_d = timeit(run_mlp, imp, pts)
    print(f"(d) raw MLP x{n_pts} pts (bf16): {ms_d:7.1f} ms", flush=True)

    # (e) the object node's sampler_sdf exactly, 5 sequential round-sized
    # calls outside the scan: isolates deform+MLP+traced-step-BARF from the
    # scan/table structure
    from hold_tpu.models.object_model import (
        object_deform,
        object_server_forward,
    )
    from hold_tpu.models.nodes import gather_object_pose
    ms_e = None
    try:
        S = scfg.N_samples_eval

        @jax.jit
        def run_query5(p, b, rd, cl):
            pose = gather_object_pose(p["object"]["tables"], b["frame_idx"])
            srv_out = object_server_forward(
                scene.servers["object"],
                jnp.broadcast_to(b["scene_scale"], (B,)), pose["transl"],
                pose["global_orient"], obj_scale=p["object"].get("obj_scale"))
            tfs = srv_out.obj_tfs
            imp_bf = _bf16_tree(p["object"]["implicit"])
            acc = 0.0
            z = jnp.linspace(0.1, 3.0, S)
            for r in range(5):
                pts_q = cl[:, None, :] + (z[None, :, None] + 0.01 * r) * rd[:, None, :]
                xc = object_deform(pts_q.reshape(B, P * S, 3), tfs, inverse=True)
                o = apply_implicit_net(
                    imp_bf, scene.plans["object"].implicit,
                    xc.reshape(-1, 3).astype(jnp.bfloat16),
                    jnp.zeros((B * P * S, 0), jnp.bfloat16),
                    step=jnp.asarray(0),
                    barf_cfg=scene.plans["object"].barf_cfg)[:, 0]
                acc = acc + o.astype(jnp.float32).sum()
            return acc

        ms_e = timeit(run_query5, params, batch, ray_dirs, cam_loc)
        print(f"(e) 5x round-sized query loop:  {ms_e:7.1f} ms", flush=True)
    except Exception as ex:
        print(f"(e) skipped: {ex}")

    print(f"R={R}: machinery {ms_a:.1f} | obj {ms_b:.1f} | hand {ms_c:.1f} | "
          f"mlp-equiv {ms_d:.1f} | query5 {ms_e}")


if __name__ == "__main__":
    main()
