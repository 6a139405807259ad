"""Synthetic sequence generator: emits the reference's build-dir contract.

Creates ``data/<seq>/build/{image/*.png, mask/*.png, data.npy, corres.txt}``
(the artifact layout documented in the reference at docs/data_doc.md:30-92 and
consumed by code/src/datasets/image_dataset.py:26-33) for a scene containing
the synthetic MANO hand grasping a sphere-ish object — so the full train /
render / evaluate stack runs end-to-end with no licensed assets or real
preprocessing pipeline.

Run: python -m hold_tpu.data.synthetic --out ./data/toy --frames 12
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _project(P: np.ndarray, pts: np.ndarray) -> np.ndarray:
    ph = np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=1)
    uvw = (P @ ph.T).T
    return uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-8)


def _raster_mesh(img: np.ndarray, mask: np.ndarray, P, verts, faces, color,
                 segm_id, cam_loc):
    """Painter's-algorithm rasterisation with cv2.fillPoly (host-side only)."""
    import cv2

    uv = _project(P, verts)
    depth = np.linalg.norm(verts - cam_loc[None], axis=1)
    tri_depth = depth[faces].mean(axis=1)
    order = np.argsort(-tri_depth)  # far to near
    # simple lambert shading per face
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(v1 - v0, v2 - v0)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-9)
    light = np.array([0.3, -0.5, -0.8])
    light /= np.linalg.norm(light)
    shade = 0.55 + 0.45 * np.abs(n @ light)
    for fi in order:
        tri = uv[faces[fi]].astype(np.int32)
        c = tuple(int(min(255, max(0, ch * shade[fi]))) for ch in color)
        cv2.fillPoly(img, [tri], c)
        cv2.fillPoly(mask, [tri], int(segm_id))


def _sphere_mesh(radius: float, n_sub: int = 2):
    """Icosphere."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ]
    )
    for _ in range(n_sub):
        edge_mid = {}
        new_faces = []
        verts = list(verts)

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2.0
                verts.append(m)
                edge_mid[key] = len(verts) - 1
            return edge_mid[key]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.array(new_faces)
        verts = np.array(verts)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * radius
    return verts.astype(np.float32), faces.astype(np.int64)


def generate_sequence(
    out_dir: str,
    n_frames: int = 12,
    img_hw: tuple[int, int] = (240, 320),
    seed: int = 0,
    two_hands: bool = False,
    pose_noise: float = 0.0,
    pose_noise_mode: str = "all",
) -> str:
    """Render a synthetic hand+object sequence.

    pose_noise > 0 simulates the REAL pipeline's noisy initialization (hand
    pose estimators / SfM): images and masks are rendered from the TRUE
    poses, but the poses written to data.npy's ``entities`` (what training
    initializes from) are perturbed with Gaussian noise of this std (radians
    on rotations, pose_noise*0.05 m on translations).  The unperturbed truth
    is kept under ``entities_gt`` for evaluation (eval/io_pred.py prefers it)
    — so pose refinement can be measured against real ground truth.

    pose_noise_mode selects WHICH parameters are corrupted:
    - "all": hand pose (articulation + global orient), hand/object
      translations, object rotation — simulates hand-estimator noise, but
      refinement (ours and the reference's fitting.py:58-68) keeps hand
      articulation/orient FROZEN, so part of this noise is unfixable by
      design.
    - "trans": only the parameters refinement actually optimizes — hand
      translation, object rotation + translation — the SfM/registration
      error component refinement exists to remove."""
    import cv2
    import jax
    import jax.numpy as jnp

    from ..mano.server import build_mano_server, mano_server_forward
    from ..utils.mesh import seal_mano_faces, seal_mano_verts

    rng = np.random.RandomState(seed)
    build = os.path.join(out_dir, "build")
    os.makedirs(os.path.join(build, "image"), exist_ok=True)
    os.makedirs(os.path.join(build, "mask"), exist_ok=True)

    H, W = img_hw
    K = np.eye(4, dtype=np.float64)
    f = 1.2 * W
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = f, f, W / 2, H / 2

    # smooth hand motion + object held near the palm
    hands = ["right", "left"] if two_hands else ["right"]
    servers = {h: build_mano_server(h == "right", np.zeros(10)) for h in hands}
    t_lin = np.linspace(0, 1, n_frames)

    entities: dict = {}
    hand_meshes_per_frame: dict = {h: [] for h in hands}
    for h in hands:
        poses = np.zeros((n_frames, 48), np.float32)
        poses[:, 0] = 0.3 * np.sin(2 * np.pi * t_lin)
        poses[:, 2] = 0.2 * np.cos(2 * np.pi * t_lin)
        poses[:, 5] = 0.4 + 0.3 * np.sin(2 * np.pi * t_lin + 1.0)
        trans = np.stack(
            [
                0.06 * np.sin(2 * np.pi * t_lin) + (0.12 if h == "left" else 0.0),
                0.02 * np.cos(2 * np.pi * t_lin),
                0.55 + 0.05 * t_lin,
            ],
            axis=1,
        ).astype(np.float32)
        srv = servers[h]
        out = mano_server_forward(
            srv, jnp.ones(n_frames), jnp.asarray(trans), jnp.asarray(poses),
            jnp.zeros((n_frames, 10)),
        )
        verts_all = np.asarray(seal_mano_verts(out.verts))
        faces_sealed = seal_mano_faces(srv.consts.faces, h == "right")
        for i in range(n_frames):
            hand_meshes_per_frame[h].append((verts_all[i], faces_sealed))
        entities[h] = {
            "mean_shape": np.zeros(10, np.float32),
            "hand_poses": poses,
            "hand_trans": trans,
        }

    # object: icosphere "ball" slightly above the palm, following the hand
    obj_r_world = 0.05
    obj_scale = 2.0 * obj_r_world  # cano radius 0.5 -> world radius
    overts_c, ofaces = _sphere_mesh(0.5, 2)
    obj_poses = np.zeros((n_frames, 6), np.float32)
    obj_poses[:, 1] = 0.5 * t_lin  # slow rotation
    obj_poses[:, 3:] = entities[hands[0]]["hand_trans"] + np.array(
        [0.0, 0.09, 0.0], np.float32
    )
    entities["object"] = {
        "object_poses": obj_poses,
        "pts.cano": overts_c.astype(np.float32),
        "obj_scale": np.float32(obj_scale),
        "norm_mat": np.eye(4, dtype=np.float32),
        # GT mesh topology (synthetic sequences ship exact GT; real builds
        # get faces from the dataset-specific GT loaders)
        "faces": ofaces.astype(np.int64),
    }

    # cameras: mild orbit around the scene center
    cameras = {}
    center = np.array([0.03, 0.03, 0.58])
    from ..utils.rot import axis_angle_to_matrix
    import jax.numpy as jnp2

    for i in range(n_frames):
        ang = 0.35 * np.sin(2 * np.pi * i / n_frames)
        R_orbit = np.asarray(
            axis_angle_to_matrix(jnp2.asarray([[0.0, ang, 0.0]], jnp2.float32))
        )[0]
        cam_pos = center + R_orbit @ (np.array([0.0, 0.0, -0.58]))
        fwd = center - cam_pos
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        R_w2c = np.stack([right, up2, fwd])
        t_w2c = -R_w2c @ cam_pos
        w2c = np.eye(4)
        w2c[:3, :3] = R_w2c
        w2c[:3, 3] = t_w2c
        world_mat = (K @ w2c).astype(np.float64)
        cameras[f"world_mat_{i}"] = world_mat
        cameras[f"scale_mat_{i}"] = np.eye(4, dtype=np.float64)

        # render frame
        img = np.zeros((H, W, 3), np.uint8)
        grad = np.linspace(60, 140, H, dtype=np.uint8)
        img[:, :, 0] = grad[:, None]
        img[:, :, 1] = (grad[:, None] * 0.8).astype(np.uint8)
        img[:, :, 2] = 90
        mask = np.zeros((H, W), np.uint8)
        P = world_mat[:3]

        overts_w = overts_c * obj_scale
        from ..utils.rot import axis_angle_to_matrix as aa2m

        R_obj = np.asarray(
            aa2m(jnp2.asarray(obj_poses[i, :3][None], jnp2.float32))
        )[0]
        overts_w = overts_w @ R_obj.T + obj_poses[i, 3:]

        draw_list = [("object", overts_w, ofaces, (40, 90, 200), 50)]
        for h in hands:
            v, fc = hand_meshes_per_frame[h][i]
            col = (180, 140, 110) if h == "right" else (110, 140, 180)
            sid = 150 if h == "right" else 250
            draw_list.append((h, v, fc, col, sid))
        # global far-to-near across entities: draw by entity mean depth
        draw_list.sort(
            key=lambda e: -np.linalg.norm(e[1].mean(0) - cam_pos)
        )
        for _, v, fc, col, sid in draw_list:
            _raster_mesh(img, mask, P, v, fc, col, sid, cam_pos)

        cv2.imwrite(os.path.join(build, "image", f"{i:04d}.png"), img[:, :, ::-1])
        cv2.imwrite(os.path.join(build, "mask", f"{i:04d}.png"), mask)

    entities_gt = None
    if pose_noise > 0.0:
        import copy

        entities_gt = copy.deepcopy(entities)  # truth, for evaluation only
        nrng = np.random.RandomState(seed + 7)
        for h in hands:
            e = entities[h]
            if pose_noise_mode == "all":
                e["hand_poses"] = (
                    e["hand_poses"] + nrng.randn(*e["hand_poses"].shape)
                    * pose_noise
                ).astype(np.float32)
            e["hand_trans"] = (
                e["hand_trans"] + nrng.randn(*e["hand_trans"].shape)
                * pose_noise * 0.05
            ).astype(np.float32)
        op = entities["object"]["object_poses"]
        noise = np.concatenate(
            [nrng.randn(n_frames, 3) * pose_noise,
             nrng.randn(n_frames, 3) * pose_noise * 0.05], axis=1
        )
        entities["object"]["object_poses"] = (op + noise).astype(np.float32)

    data = {
        "cameras": cameras,
        "entities": entities,
        "scene_bounding_sphere": 3.0,
        # eval-space conversion (identity for synthetic scenes; real builds
        # carry the camera-normalisation shift from the generator)
        "normalize_shift": np.zeros(3, np.float32),
    }
    if entities_gt is not None:
        data["entities_gt"] = entities_gt
    np.save(os.path.join(build, "data.npy"), data)
    with open(os.path.join(build, "corres.txt"), "w") as fh:
        for i in range(n_frames):
            fh.write(f"{i:04d}.png\n")
    return build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--two_hands", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pose_noise", type=float, default=0.0,
                    help="std of Gaussian noise on the init poses written to"
                         " data.npy (truth kept in entities_gt for eval)")
    ap.add_argument("--pose_noise_mode", default="all",
                    choices=("all", "trans"),
                    help="'trans' corrupts only refinement-optimizable "
                         "params (translations + object rotation)")
    args = ap.parse_args()
    build = generate_sequence(
        args.out, args.frames, (args.height, args.width), args.seed,
        args.two_hands, pose_noise=args.pose_noise,
        pose_noise_mode=args.pose_noise_mode,
    )
    print(f"Wrote synthetic sequence to {build}")


if __name__ == "__main__":
    main()
