#!/usr/bin/env python
"""Offline dataset image resize: aspect-preserving affine warp of all images
to the working resolution, in place.

Behavioral reference: /root/reference/preprocess.py — per-dataset
original/working size table and directory walks; resizing offline removes the
per-frame warp from the hot input path.

Usage: python tools/preprocess.py --dataset panoptic --dir data/Panoptic
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fvp_tpu.geometry.transforms import get_resize_transform

SIZES = {
    # dataset: (ori_w, ori_h), (out_w, out_h)
    "panoptic": ((1920, 1080), (960, 512)),
    "shelf": ((1032, 776), (800, 608)),
    "campus": ((360, 288), (800, 640)),
    "custom": ((2048, 1536), (800, 608)),
}

PATTERNS = {
    "panoptic": "*/hdImgs/*/*.jpg",
    "shelf": "Camera*/*.png",
    "campus": "Camera*/*.png",
    "custom": "Take_*/*/*.png",
}


def main():
    import cv2

    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True, choices=sorted(SIZES))
    parser.add_argument("--dir", required=True)
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    ori, out = SIZES[args.dataset]
    t = get_resize_transform(ori, out)
    paths = sorted(glob(os.path.join(args.dir, PATTERNS[args.dataset])))
    print(f"{len(paths)} images -> {out}")
    done = 0
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        if img is None:
            print(f"unreadable: {p}")
            continue
        if (img.shape[1], img.shape[0]) == out:
            continue
        resized = cv2.warpAffine(img, t[:2], out, flags=cv2.INTER_LINEAR)
        if not args.dry_run:
            cv2.imwrite(p, resized)
        done += 1
        if done % 1000 == 0:
            print(f"{done} resized")
    print(f"resized {done} images")


if __name__ == "__main__":
    main()
