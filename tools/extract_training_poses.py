#!/usr/bin/env python
"""Build panoptic_training_pose.pkl — the pose library that drives the
synthetic data factory for Shelf/Campus training.

The reference consumes this file (configs/shelf/jln64.yaml:38) but does not
ship the tool that creates it; this extracts root-centered poses from the
Panoptic training annotations in the library format
({'pose': (J, 3) mm, 'vis': (J, 4)} entries).

Usage:
  python tools/extract_training_poses.py --data_dir data/Panoptic \
      --out data/panoptic_training_pose.pkl [--coco17]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fvp_tpu.data.panoptic import M_AXES, TRAIN_LIST

# panoptic-15 -> coco-17 joint mapping (approximate head joints synthesized)
P15_TO_COCO = {
    5: 3, 6: 9, 7: 4, 8: 10, 9: 5, 10: 11, 11: 6, 12: 12,
    13: 7, 14: 13, 15: 8, 16: 14,
}


def panoptic15_to_coco17(pose15: np.ndarray) -> np.ndarray:
    coco = np.zeros((17, 3))
    coco[0] = pose15[1]                                 # nose
    neck, nose = pose15[0], pose15[1]
    up = nose - neck
    coco[1] = nose + 0.3 * up + [30, 0, 0]              # eyes/ears approx
    coco[2] = nose + 0.3 * up + [-30, 0, 0]
    coco[3] = nose + 0.15 * up + [70, 0, 0]
    coco[4] = nose + 0.15 * up + [-70, 0, 0]
    for c, p in zip((5, 7, 9, 11, 13, 15), (3, 4, 5, 6, 7, 8)):
        coco[c] = pose15[p]                             # left chain
    for c, p in zip((6, 8, 10, 12, 14, 16), (9, 10, 11, 12, 13, 14)):
        coco[c] = pose15[p]                             # right chain
    return coco


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--coco17", action="store_true",
                        help="emit coco-17 order (for Shelf/Campus configs)")
    parser.add_argument("--interval", type=int, default=12)
    parser.add_argument("--max_poses", type=int, default=50000)
    args = parser.parse_args()

    poses = []
    for seq in TRAIN_LIST:
        anno_dir = osp.join(args.data_dir, seq, "hdPose3d_stage1_coco19")
        files = sorted(glob.glob(f"{anno_dir}/*.json"))
        for i, f in enumerate(files):
            if i % args.interval:
                continue
            with open(f) as fh:
                bodies = json.load(fh)["bodies"]
            for body in bodies:
                p = np.array(body["joints19"]).reshape(-1, 4)[:15]
                vis = np.maximum(p[:, 3], 0.0)
                if vis[2] <= 0.1 or (vis > 0.1).sum() < 10:
                    continue
                xyz = p[:, :3].dot(M_AXES) * 10.0
                # center at the root in xy so placement is translation-free
                xyz[:, :2] -= xyz[2, :2]
                if args.coco17:
                    xyz = panoptic15_to_coco17(xyz)
                    vis = np.ones(17)
                entry_vis = np.tile(vis[:, None], (1, 4))
                poses.append({"pose": xyz, "vis": entry_vis})
            if len(poses) >= args.max_poses:
                break
        if len(poses) >= args.max_poses:
            break

    with open(args.out, "wb") as f:
        pickle.dump(poses, f)
    print(f"wrote {len(poses)} poses to {args.out}")


if __name__ == "__main__":
    main()
