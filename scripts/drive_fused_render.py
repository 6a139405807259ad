"""End-to-end drive of the fused render path vs the XLA shade path.

Renders one downsampled frame of a sequence through render_frame twice —
once with the layer-by-layer XLA path, once with the fused render kernel
(interpret mode off-TPU via HOLD_FUSED_RENDER=interpret, real lowering on
chip) — and compares the per-pixel maps.

Usage: python scripts/drive_fused_render.py [--case bench_seq] [--down 8]
Exit 0 = paths agree at bf16 tolerance.
"""

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _render(case, down, out_path, tpu):
    import jax

    if not tpu:
        # probing the default backend would try to initialise the TPU plugin
        # (hangs/errors when the tunnel is down) — force CPU up front
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.models.holdnet import (
        build_scene, empty_object_mesh_state, init_scene_params,
    )
    from hold_tpu.render.renderer import render_frame
    from hold_tpu.utils.config import load_config

    seq = SequenceData(case, os.path.join(ROOT, "data"), num_sample=128)
    cfg = load_config()
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    scene = build_scene(opt, {"barf_s": 1000, "barf_e": 10000},
                        seq.scene_data())
    params = init_scene_params(jax.random.PRNGKey(0), scene, seq.scene_data())
    fb = seq.full_frame_batch(0, downsample=down)
    res = render_frame(params, scene, empty_object_mesh_state(), fb,
                       pixel_per_batch=512)
    np.savez(out_path, **{k: v for k, v in res.items()})
    print("wrote", out_path, "rgb mean", float(res["rgb"].mean()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="bench_seq")
    ap.add_argument("--down", type=int, default=8)
    ap.add_argument("--render", help="(internal) child mode: output path")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the attached TPU (real kernel lowering)")
    args = ap.parse_args()

    if args.render:
        _render(args.case, args.down, args.render, args.tpu)
        return 0

    import numpy as np

    outs = {}
    fused_env = {} if args.tpu else {"HOLD_FUSED_RENDER": "interpret"}
    for tag, env_extra in (
        ("xla", {"HOLD_NO_FUSED_RENDER": "1"}),
        ("fused", fused_env),
    ):
        out = f"/tmp/drive_fused_render_{tag}.npz"
        env = {k: v for k, v in os.environ.items()
               if k not in ("HOLD_NO_FUSED_RENDER", "HOLD_FUSED_RENDER")}
        env.update(env_extra)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--case", args.case,
             "--down", str(args.down), "--render", out]
            + (["--tpu"] if args.tpu else []),
            check=True, env=env, timeout=3600,
        )
        outs[tag] = dict(np.load(out))

    ok = True
    for k in ("rgb", "normal", "depth", "mask_prob"):
        a, b = outs["xla"][k], outs["fused"][k]
        err = np.abs(a - b)
        line = f"{k}: max|xla-fused| = {err.max():.3e}, mean = {err.mean():.3e}"
        tol = 0.15 if k == "normal" else 0.05  # bf16 + normalisation noise
        if err.max() >= tol or err.mean() >= tol / 20:
            ok = False
            line += "  <-- FAIL"
        print(line)
    print("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
