"""Sequence dataset: build-dir reader + weighted pixel sampling + tempo pairs.

Host-side numpy pipeline (the TPU path consumes fixed-shape ray batches) with
semantics parity to the reference's datasets
(code/src/datasets/image_dataset.py, tempo_dataset.py, datasets/utils.py):
- cameras decomposed from P = world_mat @ scale_mat via cv2
- per-frame weighted pixel sampling: 90% inside the hand/object mask bboxes
  (split evenly), 10% uniform, bilinear interpolation of rgb/mask/uv
- training batches are random (i, i+offset) frame pairs flattened to
  2*batch_size frames.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..models.specs import SEGM_IDS


def load_K_Rt_from_P(P: np.ndarray):
    import cv2

    out = cv2.decomposeProjectionMatrix(P)
    K = out[0]
    R = out[1]
    t = out[2]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics.astype(np.float32), pose


class SequenceData:
    """Loads ``<data_root>/<case>/build``; exposes frames + cameras + params."""

    def __init__(self, case: str, data_root: str = "./data",
                 num_sample: int = 128):
        import cv2

        self.case = case
        self.root = os.path.join(data_root, case, "build")
        self.num_sample = num_sample
        data = np.load(
            os.path.join(self.root, "data.npy"), allow_pickle=True
        ).item()
        self.data = data
        self.entities = data["entities"]
        self.scene_bounding_sphere = float(data.get("scene_bounding_sphere", 3.0))

        self.img_paths = sorted(glob.glob(os.path.join(self.root, "image", "*.png")))
        assert self.img_paths, f"no images under {self.root}/image"
        self.mask_paths = sorted(glob.glob(os.path.join(self.root, "mask", "*.png")))
        if not self.mask_paths:
            self.mask_paths = [None] * len(self.img_paths)
        self.n_frames = len(self.img_paths)
        first = cv2.imread(self.img_paths[0])
        self.img_size = first.shape[:2]  # (H, W)
        self.total_pixels = int(np.prod(self.img_size))

        cams = data["cameras"]
        self.intrinsics_all, self.extrinsics_all = [], []
        self.scale_mats, self.world_mats = [], []
        for i in range(self.n_frames):
            scale_mat = cams[f"scale_mat_{i}"].astype(np.float64)
            world_mat = cams[f"world_mat_{i}"].astype(np.float64)
            self.scale_mats.append(scale_mat)
            self.world_mats.append(world_mat)
            P = (world_mat @ scale_mat)[:3, :4]
            K, pose = load_K_Rt_from_P(P)
            self.intrinsics_all.append(K)
            self.extrinsics_all.append(pose)
        self.intrinsics_all = np.stack(self.intrinsics_all)
        self.extrinsics_all = np.stack(self.extrinsics_all)
        self.scale = float(1.0 / self.scale_mats[0][0, 0])

        self.hand_ids = [k for k in ("right", "left") if k in self.entities]
        self._img_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    # -- raw frame IO -------------------------------------------------------

    def load_frame(self, idx: int):
        import cv2

        if idx in self._img_cache:
            return self._img_cache[idx]
        img = cv2.imread(self.img_paths[idx])[:, :, ::-1].astype(np.float32) / 255.0
        if self.mask_paths[idx] is None:
            mask = np.zeros(self.img_size, np.float32)
        else:
            m = cv2.imread(self.mask_paths[idx])
            mask = cv2.cvtColor(m, cv2.COLOR_BGR2GRAY).astype(np.float32)
        if len(self._img_cache) < 512:
            self._img_cache[idx] = (img, mask)
        return img, mask

    # -- pixel sampling -----------------------------------------------------

    def _bilinear(self, rows, cols, img):
        r0 = np.floor(rows).astype(np.int32)
        c0 = np.floor(cols).astype(np.int32)
        fr = (rows - r0)[:, None] if img.ndim == 3 else rows - r0
        fc = (cols - c0)[:, None] if img.ndim == 3 else cols - c0
        r1, c1 = r0 + 1, c0 + 1
        v00, v01 = img[r0, c0], img[r0, c1]
        v10, v11 = img[r1, c0], img[r1, c1]
        return (
            v00 * (1 - fr) * (1 - fc)
            + v01 * (1 - fr) * fc
            + v10 * fr * (1 - fc)
            + v11 * fr * fc
        )

    def weighted_pixel_sample(self, rng: np.random.RandomState, idx: int,
                              hand_flag: str, num_sample: int):
        """(rows, cols) float pixel coords biased to entity bboxes
        (datasets/utils.py:120-207)."""
        _, mask = self.load_frame(idx)
        H, W = self.img_size
        n_bbox = int(num_sample * 0.9)
        n_o = n_bbox // 2
        n_h = n_bbox - n_o

        where_o = np.asarray(np.where(np.abs(mask - SEGM_IDS["object"]) < 25))
        where_h = np.asarray(np.where(np.abs(mask - SEGM_IDS[hand_flag]) < 25))
        if where_o.size < 20:
            n_o, n_h = 0, n_bbox
        if where_h.size < 20:
            n_o, n_h = (n_bbox, 0) if where_o.size >= 20 else (0, 0)

        chunks = []
        for n, where in ((n_o, where_o), (n_h, where_h)):
            if n > 0:
                lo = where.min(axis=1)
                hi = where.max(axis=1)
                s = rng.rand(n, 2) * (hi - lo) + lo
                chunks.append(s)
        n_uniform = num_sample - sum(c.shape[0] for c in chunks)
        u = rng.rand(n_uniform, 2) * (np.array([H, W]) - 1)
        chunks.append(u)
        rc = np.concatenate(chunks, axis=0)
        rc[:, 0] = np.clip(rc[:, 0], 0, H - 2)
        rc[:, 1] = np.clip(rc[:, 1], 0, W - 2)
        return rc

    def sample_frame(self, rng: np.random.RandomState, idx: int,
                     num_sample: int | None = None):
        """One frame's training rays: uv (P,2 x/y), rgb (P,3), mask (P,)."""
        num_sample = num_sample or self.num_sample
        img, mask = self.load_frame(idx)
        per_hand = num_sample // len(self.hand_ids)
        rows_cols = np.concatenate(
            [
                self.weighted_pixel_sample(rng, idx, h, per_hand)
                for h in self.hand_ids
            ],
            axis=0,
        )
        rows, cols = rows_cols[:, 0], rows_cols[:, 1]
        rgb = self._bilinear(rows, cols, img)
        m = self._bilinear(rows, cols, mask)
        uv = np.stack([cols, rows], axis=1).astype(np.float32)  # (x, y)
        return {
            "uv": uv,
            "gt_rgb": rgb.astype(np.float32),
            "gt_mask": m.astype(np.float32),
        }

    # -- batches ------------------------------------------------------------

    def sample_tempo_batch(self, rng: np.random.RandomState, batch_size: int,
                           offset: int = 1, num_sample: int | None = None):
        """Training batch of `batch_size` random (i, i+offset) frame pairs
        flattened to 2*batch_size frames (tempo_dataset.py:12-38 +
        hold_utils.py:124-135)."""
        starts = rng.randint(0, max(self.n_frames - offset, 1), size=batch_size)
        frames = np.stack([starts, starts + offset], axis=1).reshape(-1)
        items = [self.sample_frame(rng, int(i), num_sample) for i in frames]
        batch = {
            "frame_idx": frames.astype(np.int32),
            "uv": np.stack([it["uv"] for it in items]),
            "gt_rgb": np.concatenate([it["gt_rgb"] for it in items]),
            "gt_mask": np.concatenate([it["gt_mask"] for it in items]),
            "intrinsics": self.intrinsics_all[frames],
            "extrinsics": self.extrinsics_all[frames],
            "scene_scale": np.float32(self.scale),
        }
        return batch

    def full_frame_batch(self, idx: int, downsample: int = 1):
        """All pixels of one frame (optionally strided) for full renders."""
        H, W = self.img_size
        ys, xs = np.mgrid[0:H:downsample, 0:W:downsample]
        uv = np.stack([xs, ys], axis=-1).reshape(1, -1, 2).astype(np.float32)
        img, mask = self.load_frame(idx)
        rgb = img[::downsample, ::downsample].reshape(-1, 3)
        m = mask[::downsample, ::downsample].reshape(-1)
        return {
            "frame_idx": np.asarray([idx], np.int32),
            "uv": uv,
            "gt_rgb": rgb.astype(np.float32),
            "gt_mask": m.astype(np.float32),
            "intrinsics": self.intrinsics_all[idx][None],
            "extrinsics": self.extrinsics_all[idx][None],
            "scene_scale": np.float32(self.scale),
            "img_hw": (ys.shape[0], ys.shape[1]),
        }

    def scene_data(self) -> dict:
        return {
            "entities": self.entities,
            "scale": self.scale,
            "n_frames": self.n_frames,
            "scene_bounding_sphere": self.scene_bounding_sphere,
        }


def test_frame_split(n_frames: int, num_agents: int, agent_id: int) -> list[int]:
    """Embarrassingly-parallel frame sharding for cluster render jobs
    (eval_datasets.py:44-53)."""
    chunks = np.array_split(np.arange(n_frames), num_agents)
    return chunks[agent_id].tolist()
