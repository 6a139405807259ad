"""Batch video cropping (generator/scripts_arctic/crop_arctic_videos.py role).

The reference tool is an interactive bbox picker; headless environments get a
CLI: crop every frame of a video to a fixed box (or auto-crop to the union of
non-background mask pixels) and re-encode.

python -m hold_tpu.data.crop_videos --video in.mp4 --out out.mp4 \
    --box x0 y0 x1 y1
"""

from __future__ import annotations

import argparse


def crop_video(video: str, out: str, box=None, mask_dir: str | None = None,
               margin: int = 20) -> tuple:
    import cv2
    import numpy as np

    cap = cv2.VideoCapture(video)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30

    if box is None and mask_dir:
        import glob
        import os

        lo = None
        hi = None
        for p in sorted(glob.glob(os.path.join(mask_dir, "*.png"))):
            m = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            ys, xs = np.where(m > 0)
            if ys.size == 0:
                continue
            l = np.array([xs.min(), ys.min()])
            h = np.array([xs.max(), ys.max()])
            lo = l if lo is None else np.minimum(lo, l)
            hi = h if hi is None else np.maximum(hi, h)
        box = (int(lo[0]) - margin, int(lo[1]) - margin,
               int(hi[0]) + margin, int(hi[1]) + margin)
    assert box is not None, "need --box or --mask_dir"
    x0, y0, x1, y1 = box

    writer = None
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        H, W = frame.shape[:2]
        cx0, cy0 = max(x0, 0), max(y0, 0)
        cx1, cy1 = min(x1, W), min(y1, H)
        crop = frame[cy0:cy1, cx0:cx1]
        if writer is None:
            writer = cv2.VideoWriter(
                out, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                (crop.shape[1], crop.shape[0]),
            )
        writer.write(crop)
        n += 1
    cap.release()
    if writer:
        writer.release()
    return box, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--box", type=int, nargs=4, default=None)
    ap.add_argument("--mask_dir", default=None)
    ap.add_argument("--margin", type=int, default=20)
    args = ap.parse_args()
    box, n = crop_video(args.video, args.out, args.box, args.mask_dir,
                        args.margin)
    print(f"cropped {n} frames to box {box} -> {args.out}")


if __name__ == "__main__":
    main()
