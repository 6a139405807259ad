"""Full-sequence rendering: python -m hold_tpu.render_cli --exp <dir> --case <seq>.

Role parity with code/render.py: loads a trained experiment, renders every
test frame (optionally strided / sharded across cluster agents via
--agent_id/--num_agents like eval_datasets.py:44-53), writes visualization
panels and fp16 normal exports (hold.py:216-228)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from .data.dataset import SequenceData, test_frame_split
from .models.holdnet import empty_object_mesh_state, object_mesh_state_from_mesh
from .render.renderer import outputs_to_panel, render_frame


def main():
    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # every CLI pays remote TPU compiles otherwise
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--case", required=True)
    ap.add_argument("--data_root", default="./data")
    ap.add_argument("--render_downsample", type=int, default=2)
    ap.add_argument("--agent_id", type=int, default=0)
    ap.add_argument("--num_agents", type=int, default=1)
    ap.add_argument("--pixel_per_batch", type=int, default=4096)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from .eval.io_pred import load_experiment

    seq = SequenceData(args.case, args.data_root)
    params, misc, scene = load_experiment(args.exp, seq)

    mesh_cano = misc.get("meshes_cano", {}).get("object")
    mesh_state = (
        object_mesh_state_from_mesh(mesh_cano["vertices"], mesh_cano["faces"])
        if mesh_cano is not None
        else empty_object_mesh_state()
    )

    out_dir = args.out or os.path.join(args.exp, "renders")
    os.makedirs(out_dir, exist_ok=True)
    norm_dir = os.path.join("exports", os.path.basename(args.exp.rstrip("/")),
                            "normal")
    os.makedirs(norm_dir, exist_ok=True)

    frames = test_frame_split(seq.n_frames, args.num_agents, args.agent_id)
    from PIL import Image

    from .parallel.sharding import make_mesh
    from .render.renderer import make_chunk_renderer

    dev_mesh = make_mesh(0)
    # chunk size must divide the mesh; round up so every device gets pixels
    ppb = args.pixel_per_batch
    ppb += (-ppb) % dev_mesh.devices.size
    chunk_fn = make_chunk_renderer(scene, mesh_state, ppb, mesh=dev_mesh)
    for idx in frames:
        fb = seq.full_frame_batch(idx, downsample=args.render_downsample)
        res = render_frame(params, scene, mesh_state, fb,
                           pixel_per_batch=ppb,
                           chunk_fn=chunk_fn, mesh=dev_mesh)
        H, W = fb["img_hw"]
        gt = fb["gt_rgb"].reshape(H, W, 3)
        panel = outputs_to_panel(res, gt_rgb=gt)
        Image.fromarray((np.clip(panel, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{idx:04d}.png")
        )
        np.save(os.path.join(norm_dir, f"{idx:04d}.npy"),
                res["normal"].astype(np.float16))
        print(f"rendered frame {idx} -> {out_dir}")


if __name__ == "__main__":
    main()
