"""Projection/sampling parity tests.

The oracle is torch.nn.functional.grid_sample (the exact op the reference
uses, bilinear + align_corners=True + zero padding), driven through the
reference's coordinate chain re-derived independently here. This pins down the
silent-metric-killer semantics: clamp bounds, align_corners normalization,
border behavior, and the per-person fine-grid crop/scatter."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fvp_tpu.config import FVPConfig
from fvp_tpu.geometry.cameras import project_points_np
from fvp_tpu.geometry.grids import (
    RigConstants, build_rig_constants, heatmap_transform, voxel_grid,
)
from fvp_tpu.geometry.transforms import affine_apply
from fvp_tpu.ops.sampling import (
    bilinear_sample, collapse_planes, project_whole, sample_person_cubes,
    snap_centers,
)
from tests.helpers import random_rig, tiny_config


def torch_grid_sample(hm: np.ndarray, g: np.ndarray) -> np.ndarray:
    """hm (J, H, W), g (N, 2) normalized coords -> (J, N)."""
    t_hm = torch.from_numpy(hm)[None]                    # (1, J, H, W)
    t_g = torch.from_numpy(g)[None, None]                # (1, 1, N, 2)
    out = F.grid_sample(t_hm, t_g, align_corners=True)
    return out[0, :, 0].numpy()


def test_bilinear_matches_torch(rng):
    J, H, W = 4, 128, 240
    hm = rng.rand(J, H, W).astype(np.float32)
    g = rng.uniform(-1.15, 1.15, (1000, 2)).astype(np.float32)
    g = np.clip(g, -1.1, 1.1)
    px = (g + 1.0) * 0.5 * np.array([W - 1, H - 1], np.float32)
    ours = np.asarray(bilinear_sample(
        jnp.asarray(hm), jnp.asarray(px[:, 0]), jnp.asarray(px[:, 1])))
    ref = torch_grid_sample(hm, g)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bilinear_exact_corners(rng):
    J, H, W = 2, 16, 24
    hm = rng.rand(J, H, W).astype(np.float32)
    # integer pixel coords must return exact pixel values
    xs = rng.randint(0, W, 50)
    ys = rng.randint(0, H, 50)
    out = np.asarray(bilinear_sample(
        jnp.asarray(hm), jnp.asarray(xs.astype(np.float32)),
        jnp.asarray(ys.astype(np.float32))))
    np.testing.assert_allclose(out, hm[:, ys, xs], atol=1e-6)


def _reference_sample_grid(cfg: FVPConfig, rig, points: np.ndarray):
    """Independent re-derivation of the reference's normalized sampling grid
    (project_whole.py:96-117) in float64: project, clamp, resize-affine,
    rescale to heatmap, normalize by (size-1), clamp to +-1.1."""
    w, h = cfg.heatmap_size
    grids = []
    for v in range(rig.num_cameras):
        xy = project_points_np(points, rig.camera(v))
        xy = np.clip(xy, -1.0, float(max(cfg.ori_image_size)))
        xy = affine_apply(xy, heatmap_transform(cfg))
        g = xy / np.array([w - 1.0, h - 1.0]) * 2.0 - 1.0
        grids.append(np.clip(g, -1.1, 1.1))
    return np.stack(grids)


def test_project_whole_matches_torch_pipeline(rng):
    cfg = tiny_config(num_views=3, voxels_per_axis=(16, 16, 8))
    rig = random_rig(rng, num_views=3)
    rc = build_rig_constants(cfg, rig)

    J = cfg.num_joints
    w, h = cfg.heatmap_size
    heatmaps = rng.rand(3, J, h, w).astype(np.float32)

    got = np.asarray(project_whole(jnp.asarray(heatmaps), rc, cfg))

    pts = voxel_grid(cfg.space_size, cfg.space_center, cfg.voxels_per_axis)
    grids = _reference_sample_grid(cfg, rig, pts).astype(np.float32)
    per_view = np.stack([torch_grid_sample(heatmaps[v], grids[v])
                         for v in range(3)])
    expected = np.clip(per_view.mean(0), 0.0, 1.0)
    nx, ny, nz = cfg.voxels_per_axis
    expected = expected.reshape(J, nx, ny, nz).transpose(1, 2, 3, 0)

    np.testing.assert_allclose(got, expected, atol=1e-3)


def _oracle_person_cubes(cfg: FVPConfig, rig, heatmaps, centers, bbox):
    """Dense emulation of the reference per-person path
    (project_individual.py:222-293): full fine grid, projected + normalized,
    cropped per person by start/end, torch-grid_sampled, scattered into the
    cube."""
    fine = np.array(cfg.fine_voxels_per_axis)
    ind_vox = np.array(cfg.ind_voxels_per_axis)
    space = np.array(cfg.space_size)
    num_people = centers.shape[0]
    J = heatmaps.shape[1]

    fine_grid = voxel_grid(cfg.space_size, cfg.space_center, fine)
    grids = _reference_sample_grid(cfg, rig, fine_grid).astype(np.float32)
    grids = grids.reshape(rig.num_cameras, *fine, 2)

    scale = (fine - 1.0) / space
    bias = (-np.array(cfg.ind_space_size) / 2.0 / space * (fine - 1.0)
            - scale * (np.array(cfg.space_center) - space / 2.0))
    ctl = np.round(centers * scale + bias).astype(np.int64)

    mask = ((1 - bbox) / 2.0 * (ind_vox[:2] - 1)).astype(np.int64)
    mask = np.maximum(mask, 0)
    mask = np.concatenate([mask, np.zeros((num_people, 1), np.int64)], 1)
    start = np.maximum(ctl + mask, 0)
    end = np.minimum(ctl + ind_vox - mask, fine)

    cubes = np.zeros((num_people, J, *ind_vox), np.float32)
    for i in range(num_people):
        if np.any(start[i] >= end[i]):
            continue
        crop = grids[:, start[i, 0]:end[i, 0], start[i, 1]:end[i, 1],
                     start[i, 2]:end[i, 2]].reshape(rig.num_cameras, -1, 2)
        sampled = np.stack([torch_grid_sample(heatmaps[v], crop[v])
                            for v in range(rig.num_cameras)])
        acc = sampled.mean(0).reshape(J, *(end[i] - start[i]))
        sl = [slice(start[i, a] - ctl[i, a], end[i, a] - ctl[i, a])
              for a in range(3)]
        cubes[i, :, sl[0], sl[1], sl[2]] = acc
    return np.clip(cubes, 0.0, 1.0)


def test_person_cubes_match_oracle(rng):
    cfg = tiny_config(num_views=2, ind_voxels_per_axis=(8, 8, 8),
                      max_people=4)
    rig = random_rig(rng, num_views=2)
    rc = build_rig_constants(cfg, rig)
    J = cfg.num_joints
    w, h = cfg.heatmap_size
    heatmaps = rng.rand(2, J, h, w).astype(np.float32)

    centers = np.stack([
        rng.uniform(-3000, 3000, 4),
        rng.uniform(-3500, 3000, 4),
        rng.uniform(0, 1600, 4),
    ], 1).astype(np.float32)
    # include one person at the space edge (boundary crop) and one tiny bbox
    centers[2] = [-3900.0, -4450.0, 100.0]
    bbox = rng.uniform(0.2, 0.9, (4, 2)).astype(np.float32)
    bbox[3] = [0.05, 0.05]

    cubes, offset = sample_person_cubes(
        jnp.asarray(heatmaps), rc, cfg, jnp.asarray(centers),
        jnp.asarray(bbox))
    got = np.asarray(cubes).transpose(0, 4, 1, 2, 3)   # (P, J, X, Y, Z)

    expected = _oracle_person_cubes(cfg, rig, heatmaps, centers, bbox)
    np.testing.assert_allclose(got, expected, atol=1e-3)

    # offset parity (project_individual.py:258)
    fine = np.array(cfg.fine_voxels_per_axis, np.float64)
    space = np.array(cfg.space_size)
    scale = (fine - 1.0) / space
    bias = (-np.array(cfg.ind_space_size) / 2.0 / space * (fine - 1.0)
            - scale * (np.array(cfg.space_center) - space / 2.0))
    ctl = np.round(centers * scale + bias)
    exp_offset = (ctl / (fine - 1.0) * space - space / 2.0
                  + np.array(cfg.ind_space_size) / 2.0)
    np.testing.assert_allclose(np.asarray(offset), exp_offset, atol=1e-3)


def test_snap_centers_round_half_even():
    cfg = tiny_config()
    centers = jnp.asarray([[0.0, 0.0, 800.0]], jnp.float32)
    corner, offset = snap_centers(centers, cfg)
    assert corner.dtype == jnp.int32
    assert offset.shape == (1, 3)


def test_collapse_planes_shapes(rng):
    cubes = jnp.asarray(rng.rand(2, 8, 8, 8, 5).astype(np.float32))
    planes = collapse_planes(cubes)
    assert planes.shape == (3, 2, 8, 8, 5)
    np.testing.assert_allclose(
        np.asarray(planes[0]), np.asarray(cubes).max(3), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(planes[1]), np.asarray(cubes).max(2), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(planes[2]), np.asarray(cubes).max(1), atol=1e-6)
