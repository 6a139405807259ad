"""Dataset builder: fitted parameters + frames -> data/<seq>/build contract.

Role parity with generator/scripts/build_dataset.py:139-315 +
generator/src/building/build_utils.py:36-67: copies frames/masks, converts
fitted camera-space parameters into the normalized world convention (cameras
inside the unit bounding sphere via a scale matrix from the maximum camera
radius), packs data.npy (cameras, entities, scene bounding sphere,
normalize_shift) and writes corres.txt.

python -m hold_tpu.generator.build_dataset --seq <name> --processed <dir> ...
(programmatic API: build_from_arrays)
"""

from __future__ import annotations

import os
import os.path as op
import shutil
from glob import glob

import numpy as np


def camera_normalization(w2c_all: np.ndarray, target_radius: float = 3.0):
    """Scale matrix placing all camera centers inside the bounding sphere
    (build_utils.py:36-67 role)."""
    centers = np.stack([-w2c[:3, :3].T @ w2c[:3, 3] for w2c in w2c_all])
    max_r = float(np.linalg.norm(centers, axis=1).max())
    s = target_radius * 0.9 / max(max_r, 1e-9)
    scale_mat = np.eye(4)
    scale_mat[:3, :3] /= s
    return scale_mat, s


def build_from_arrays(
    out_dir: str,
    image_paths: list[str],
    mask_paths: list[str] | None,
    K: np.ndarray,  # (3, 3) shared intrinsics
    w2c_all: np.ndarray,  # (F, 4, 4)
    entities: dict,  # same schema as data.npy entities
    normalize_shift: np.ndarray | None = None,
    scene_bounding_sphere: float = 3.0,
) -> str:
    build = op.join(out_dir, "build")
    os.makedirs(op.join(build, "image"), exist_ok=True)
    os.makedirs(op.join(build, "mask"), exist_ok=True)

    F = len(image_paths)
    cameras = {}
    K4 = np.eye(4)
    K4[:3, :3] = K
    scale_mat, s = camera_normalization(w2c_all, scene_bounding_sphere)
    for i in range(F):
        world_mat = K4 @ w2c_all[i]
        cameras[f"world_mat_{i}"] = world_mat.astype(np.float64)
        cameras[f"scale_mat_{i}"] = scale_mat.astype(np.float64)

    names = []
    for i, p in enumerate(image_paths):
        name = f"{i:04d}.png"
        names.append(name)
        shutil.copy(p, op.join(build, "image", name))
        if mask_paths and mask_paths[i]:
            shutil.copy(mask_paths[i], op.join(build, "mask", name))

    data = {
        "cameras": cameras,
        "entities": entities,
        "scene_bounding_sphere": float(scene_bounding_sphere),
        "normalize_shift": (
            np.zeros(3, np.float32) if normalize_shift is None
            else np.asarray(normalize_shift, np.float32)
        ),
    }
    np.save(op.join(build, "data.npy"), data)
    with open(op.join(build, "corres.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return build


def entities_from_fits(
    hand_fits: dict[str, dict],  # hand -> {poses (F,48), betas (10,), transl}
    obj_poses: np.ndarray,  # (F, 6) rot_aa + transl
    pts_cano: np.ndarray,
    obj_scale: float,
    norm_mat: np.ndarray | None = None,
) -> dict:
    entities = {}
    for h, fit in hand_fits.items():
        entities[h] = {
            "mean_shape": np.asarray(fit["betas"], np.float32),
            "hand_poses": np.asarray(fit["poses"], np.float32),
            "hand_trans": np.asarray(fit["transl"], np.float32),
        }
    entities["object"] = {
        "object_poses": np.asarray(obj_poses, np.float32),
        "pts.cano": np.asarray(pts_cano, np.float32),
        "obj_scale": np.float32(obj_scale),
        "norm_mat": (
            np.eye(4, dtype=np.float32) if norm_mat is None
            else np.asarray(norm_mat, np.float32)
        ),
    }
    return entities


def init_dataset_from_video(video_path: str, out_dir: str, skip_every: int = 1,
                            max_frames: int = 0) -> list[str]:
    """Video -> frame PNGs (generator/scripts/init_dataset.py role)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    paths = []
    i = kept = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % max(skip_every, 1) == 0:
            p = op.join(out_dir, f"{kept:04d}.png")
            cv2.imwrite(p, frame)
            paths.append(p)
            kept += 1
            if max_frames and kept >= max_frames:
                break
        i += 1
    cap.release()
    return paths


def merge_entity_masks(mask_dirs: dict[str, str], out_dir: str) -> list[str]:
    """Merge per-entity binary masks into one {0,50,150,250}-coded mask
    (generator/scripts/validate_masks.py:13-100 role)."""
    import cv2

    from ..models.specs import SEGM_IDS

    os.makedirs(out_dir, exist_ok=True)
    first = sorted(glob(op.join(next(iter(mask_dirs.values())), "*.png")))
    out_paths = []
    for p in first:
        name = op.basename(p)
        merged = None
        for nid, d in mask_dirs.items():
            m = cv2.imread(op.join(d, name), cv2.IMREAD_GRAYSCALE)
            if m is None:
                continue
            if merged is None:
                merged = np.zeros_like(m)
            merged[m > 127] = SEGM_IDS[nid]
        out_p = op.join(out_dir, name)
        cv2.imwrite(out_p, merged)
        out_paths.append(out_p)
    return out_paths
