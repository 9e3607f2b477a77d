"""Voxel grids and precomputed per-rig projection constants.

TPU-first design: camera geometry is static per rig, so everything derivable
from it is precomputed ONCE on the host into plain arrays (`RigConstants`) and
passed into the jitted pipeline as device-resident constants. This replaces
the reference's lazily-built, mutable per-sequence grid caches
(/root/reference/lib/models/project_whole.py:149-159,
 /root/reference/lib/models/project_individual.py:192-220) with a functional
equivalent — and drops the reference's ~4M-point fine-grid cache entirely:
per-person cube positions are reconstructed on the fly from the snapped corner
index (see fvp_tpu/ops/sampling.py), which is mathematically identical because
the fine-grid pitch equals the individual-cube pitch by construction
(project_individual.py:50).

Sampling-coordinate semantics preserved exactly (silent metric killers
otherwise): clamp projected pixels to [-1, max(ori_w, ori_h)] (a scalar bound
on both axes — reference quirk, project_whole.py:100), affine to the working
resolution, rescale to heatmap pixels, normalize by (size-1) (align_corners),
clamp the normalized coords to [-1.1, 1.1] (project_whole.py:111-116).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import numpy as np

from fvp_tpu.config import FVPConfig
from fvp_tpu.geometry.cameras import CameraRig, project_points_np
from fvp_tpu.geometry.transforms import affine_apply, get_resize_transform


def voxel_grid(space_size, space_center, nbins) -> np.ndarray:
    """Centers of an (nx, ny, nz) voxel grid -> (nx*ny*nz, 3), x-major C
    order (reference project_whole.py:43-79)."""
    axes = [
        np.linspace(-s / 2.0, s / 2.0, int(n)) + c
        for s, c, n in zip(space_size, space_center, nbins)
    ]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    return np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1)


def center_grids(cfg: FVPConfig) -> np.ndarray:
    """The three orthogonal-plane coordinate grids used by soft-argmax:
    (3, nx*ny, 2) mm coordinates for the xy / xz / yz collapses of the
    individual cube centered at the whole-space center
    (reference project_individual.py:101-107)."""
    nx, ny, nz = cfg.ind_voxels_per_axis
    assert nx == ny == nz, "individual cube must be isotropic"
    grid = voxel_grid(cfg.ind_space_size, cfg.space_center,
                      cfg.ind_voxels_per_axis).reshape(nx, ny, nz, 3)
    xy = grid[:, :, 0, :2].reshape(-1, 2)
    xz = grid[:, 0, :, ::2].reshape(-1, 2)
    yz = grid[0, :, :, 1:].reshape(-1, 2)
    return np.stack([xy, xz, yz])


def heatmap_transform(cfg: FVPConfig) -> np.ndarray:
    """Fused 2x3 affine: original-image pixels -> heatmap pixels
    (resize transform composed with the image->heatmap rescale)."""
    t = get_resize_transform(cfg.ori_image_size, cfg.image_size)
    sx = cfg.heatmap_size[0] / cfg.image_size[0]
    sy = cfg.heatmap_size[1] / cfg.image_size[1]
    return t * np.array([[sx], [sy]])


def to_sample_px(xy_ori, cfg: FVPConfig, hm_t, xp=np):
    """Projected original-image pixels (..., 2) -> heatmap-space sampling
    pixels with the reference's exact clamp chain. Works with numpy (host
    precompute) or jnp (on-device per-person path) via the `xp` namespace."""
    bound = float(max(cfg.ori_image_size))
    w, h = cfg.heatmap_size
    wh1 = xp.asarray([w - 1.0, h - 1.0], dtype=xy_ori.dtype)
    xy = xp.clip(xy_ori, -1.0, bound)
    xy = affine_apply(xy, xp.asarray(hm_t, dtype=xy_ori.dtype))
    g = xy / wh1 * 2.0 - 1.0
    g = xp.clip(g, -1.1, 1.1)
    return (g + 1.0) * 0.5 * wh1


def to_sample_px_uv(u, v, cfg: FVPConfig, hm_t, xp=np):
    """Structure-of-arrays variant of `to_sample_px` for the on-device path:
    (u (N,), v (N,)) -> (px (N,), py (N,)). Avoids (N, 2)-shaped arrays,
    whose minor-dim-2 layout pads 64x on TPU."""
    bound = float(max(cfg.ori_image_size))
    w, h = cfg.heatmap_size
    u = xp.clip(u, -1.0, bound)
    v = xp.clip(v, -1.0, bound)
    x = hm_t[0, 0] * u + hm_t[0, 1] * v + hm_t[0, 2]
    y = hm_t[1, 0] * u + hm_t[1, 1] * v + hm_t[1, 2]
    gx = xp.clip(x / (w - 1.0) * 2.0 - 1.0, -1.1, 1.1)
    gy = xp.clip(y / (h - 1.0) * 2.0 - 1.0, -1.1, 1.1)
    return (gx + 1.0) * 0.5 * (w - 1.0), (gy + 1.0) * 0.5 * (h - 1.0)


@jax.tree_util.register_dataclass
@dataclass
class RigConstants:
    """Device-resident constants for one camera rig + capture space.

    whole_sample_px: (V, 2, num_bins) heatmap-pixel sampling coords (x, y
                     as separate rows — TPU lane-padding avoidance) of every
                     coarse voxel center in every view.
    center_grid:     (3, ind_nx*ind_ny, 2) plane mm-coordinate grids.
    rig:             CameraRig (f32) for the on-the-fly per-person path.
    hm_transform:    (2, 3) original-pixel -> heatmap-pixel affine.
    """

    whole_sample_px: Any
    center_grid: Any
    rig: CameraRig
    hm_transform: Any


def build_rig_constants(cfg: FVPConfig, rig: CameraRig) -> RigConstants:
    grid = voxel_grid(cfg.space_size, cfg.space_center, cfg.voxels_per_axis)
    hm_t = heatmap_transform(cfg)
    sample_px = np.stack([
        to_sample_px(
            project_points_np(grid, rig.camera(v)).astype(np.float32),
            cfg, hm_t.astype(np.float32),
        ).T
        for v in range(rig.num_cameras)
    ])                                     # (V, 2, num_bins)
    return RigConstants(
        whole_sample_px=sample_px.astype(np.float32),
        center_grid=center_grids(cfg).astype(np.float32),
        rig=rig.astype(np.float32),
        hm_transform=hm_t.astype(np.float32),
    )
