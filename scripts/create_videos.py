"""Encode rendered frame folders into mp4s (bash/create_videos.sh role).

python scripts/create_videos.py logs/<exp>/renders [--fps 10]
Uses cv2's encoder (no ffmpeg binary dependency needed)."""

import argparse
import glob
import os
import sys

# see hold_tpu/__init__.py: cv2's OpenMP workers starve XLA:CPU otherwise
os.environ.setdefault("OPENCV_FOR_THREADS_NUM", "1")


def encode(folder: str, fps: int) -> str | None:
    import cv2
    import numpy as np

    frames = sorted(glob.glob(os.path.join(folder, "*.png")))
    if not frames:
        return None
    first = cv2.imread(frames[0])
    h, w = first.shape[:2]
    out_p = folder.rstrip("/") + ".mp4"
    vw = cv2.VideoWriter(out_p, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        img = cv2.imread(f)
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h))
        vw.write(img)
    vw.release()
    return out_p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("folders", nargs="+")
    ap.add_argument("--fps", type=int, default=10)
    args = ap.parse_args()
    for folder in args.folders:
        out = encode(folder, args.fps)
        print(f"{folder} -> {out}" if out else f"{folder}: no frames")


if __name__ == "__main__":
    sys.exit(main())
