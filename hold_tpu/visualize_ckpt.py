"""Checkpoint visualization: python -m hold_tpu.visualize_ckpt --exp <dir> --case <seq>.

Role parity with code/visualize_ckpt.py + common/viewer.py (aitviewer based):
aitviewer/OpenGL isn't available headless here, so this renders mesh overlays
(posed MANO + object) onto the source video frames with the painter's
rasterizer, exports per-frame PNGs and an mp4 (via cv2), plus optional
depth/mask layers — the same artifacts the reference viewer exports headless
(common/viewer.py:42-301).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def overlay_mesh(img: np.ndarray, verts_cam: np.ndarray, faces: np.ndarray,
                 K: np.ndarray, color, alpha=0.6):
    import cv2

    H, W = img.shape[:2]
    layer = img.copy()
    z = np.maximum(verts_cam[:, 2], 1e-6)
    u = verts_cam[:, 0] * K[0, 0] / z + K[0, 2]
    v = verts_cam[:, 1] * K[1, 1] / z + K[1, 2]
    uv = np.stack([u, v], 1)
    depth = np.linalg.norm(verts_cam, axis=1)
    tri_depth = depth[faces].mean(1)
    order = np.argsort(-tri_depth)
    v0 = verts_cam[faces[:, 0]]
    v1 = verts_cam[faces[:, 1]]
    v2 = verts_cam[faces[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-9)
    light = np.array([0.2, -0.4, -0.9])
    light /= np.linalg.norm(light)
    shade = 0.5 + 0.5 * np.abs(n @ light)
    for fi in order:
        if (verts_cam[faces[fi], 2] <= 1e-6).any():
            continue
        tri = uv[faces[fi]].astype(np.int32)
        c = tuple(int(min(255, ch * shade[fi])) for ch in color)
        cv2.fillPoly(layer, [tri], c)
    return cv2.addWeighted(layer, alpha, img, 1 - alpha, 0)


def main():
    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # every CLI pays remote TPU compiles otherwise
    import cv2
    import jax.numpy as jnp

    from .data.dataset import SequenceData
    from .eval.io_pred import load_experiment
    from .mano.server import mano_server_forward
    from .models.object_model import build_object_server, object_server_forward
    from .utils.mesh import decimate_mesh

    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--case", required=True)
    ap.add_argument("--data_root", default="./data")
    ap.add_argument("--out", default="")
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--headless", action="store_true", default=True)
    ap.add_argument("--no_html", action="store_true",
                    help="skip the interactive HTML viewer export")
    ap.add_argument("--html_max_frames", type=int, default=120)
    args = ap.parse_args()

    seq = SequenceData(args.case, args.data_root)
    params, misc, scene = load_experiment(args.exp, seq)
    out_dir = args.out or os.path.join(args.exp, "viewer")
    os.makedirs(out_dir, exist_ok=True)

    n = seq.n_frames
    s = seq.scale
    w2c_all = np.stack([np.linalg.inv(e) for e in seq.extrinsics_all])
    K = seq.intrinsics_all[0][:3, :3]

    # posed entity meshes per frame
    meshes = {}
    for nid in scene.node_ids:
        tables = params[nid]["tables"]
        if nid in ("right", "left"):
            srv = scene.servers[nid]
            thetas = jnp.concatenate(
                [tables["global_orient"], tables["pose"]], axis=-1
            )
            o = mano_server_forward(
                srv, jnp.full((n,), s), tables["transl"], thetas,
                jnp.broadcast_to(tables["betas"], (n, 10)),
            )
            meshes[nid] = (np.asarray(o.verts), np.asarray(srv.consts.faces))
        else:
            mc = misc.get("meshes_cano", {}).get("object")
            if mc is None:
                continue
            m = decimate_mesh(mc["vertices"], mc["faces"], 8000)
            srv = build_object_server(
                m.vertices, float(np.asarray(params[nid]["obj_scale"])), np.eye(4)
            )
            o = object_server_forward(
                srv, jnp.full((n,), s), tables["transl"],
                tables["global_orient"],
            )
            meshes[nid] = (np.asarray(o.verts), m.faces)

    colors = {"right": (255, 180, 140), "left": (140, 180, 255),
              "object": (120, 220, 120)}
    H, W = seq.img_size
    video = cv2.VideoWriter(
        os.path.join(out_dir, "overlay.mp4"),
        cv2.VideoWriter_fourcc(*"mp4v"), args.fps, (W, H),
    )
    images = []
    for i in range(n):
        img, _ = seq.load_frame(i)
        images.append((img * 255).astype(np.uint8))
        frame = images[-1].copy()
        w2c = w2c_all[i]
        for nid, (verts_all, faces) in meshes.items():
            v_cam = verts_all[i] @ w2c[:3, :3].T + w2c[:3, 3]
            frame = overlay_mesh(frame, v_cam, faces, K, colors[nid])
        cv2.imwrite(os.path.join(out_dir, f"{i:04d}.png"), frame[:, :, ::-1])
        video.write(frame[:, :, ::-1])
    video.release()
    print(f"wrote {n} overlay frames + overlay.mp4 to {out_dir}")

    if not args.no_html:
        # interactive substitute for the aitviewer scene (viewer.py:42-301):
        # orbit-able posed meshes + camera path + billboarded source video,
        # one self-contained file
        from .render.html_viewer import export_html_viewer, pack_scene

        blob = pack_scene(
            meshes, w2c_all, K, seq.img_size, images=images,
            max_frames=args.html_max_frames,
        )
        p = export_html_viewer(
            os.path.join(out_dir, "viewer.html"), blob,
            title=f"hold_tpu {args.case}",
        )
        print(f"wrote interactive viewer {p}")


if __name__ == "__main__":
    main()
