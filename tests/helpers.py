"""Shared test fixtures: synthetic camera rigs and small configs."""

from __future__ import annotations

import numpy as np

from fvp_tpu.config import FVPConfig
from fvp_tpu.geometry.cameras import CameraRig


def random_rig(rng: np.random.RandomState, num_views: int = 5,
               center=(0.0, -500.0, 800.0), radius: float = 4500.0,
               height: float = 2200.0) -> CameraRig:
    """Plausible inward-looking camera ring around the capture space."""
    cams = []
    center = np.asarray(center, np.float64)
    for v in range(num_views):
        ang = 2 * np.pi * v / num_views + rng.uniform(-0.15, 0.15)
        pos = center + np.array([radius * np.cos(ang),
                                 radius * np.sin(ang),
                                 height + rng.uniform(-200, 200)])
        # look-at rotation: camera z axis points at the space center
        fwd = center + np.array([0.0, 0.0, 900.0]) - pos
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, -1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd])   # world->camera rows
        cams.append({
            "R": R,
            "T": pos.reshape(3, 1),
            "fx": 1500.0 + rng.uniform(-50, 50),
            "fy": 1500.0 + rng.uniform(-50, 50),
            "cx": 960.0 + rng.uniform(-5, 5),
            "cy": 540.0 + rng.uniform(-5, 5),
            "k": (rng.uniform(-0.2, 0.2, (3, 1)) * [[1.0], [0.1], [0.01]]),
            "p": rng.uniform(-0.01, 0.01, (2, 1)),
        })
    return CameraRig.from_dicts(cams)


def tiny_config(**kw) -> FVPConfig:
    """A small-but-real config for fast tests."""
    base = dict(
        num_joints=15,
        num_views=3,
        ori_image_size=(1920, 1080),
        image_size=(960, 512),
        heatmap_size=(240, 128),
        space_size=(8000.0, 8000.0, 2000.0),
        space_center=(0.0, -500.0, 800.0),
        voxels_per_axis=(80, 80, 20),
        ind_space_size=(2000.0, 2000.0, 2000.0),
        ind_voxels_per_axis=(64, 64, 64),
        max_people=10,
    )
    base.update(kw)
    return FVPConfig(**base)
