"""Heatmap -> voxel sampling: the hot projection/aggregation path.

Semantics contract (verified against torch.nn.functional.grid_sample in
tests/test_sampling.py): bilinear, align_corners=True, zero padding — an
out-of-bounds corner pixel contributes 0. The reference drives grid_sample
with normalized coords clamped to [-1.1, 1.1]
(/root/reference/lib/models/project_whole.py:111-116); our precomputed
sampling coords bake that clamp in and stay in heatmap-pixel space.

Whole-space path: one gather-based bilinear sample of every view's heatmaps at
the precomputed voxel projections, mean over views, clamp to [0, 1]
(project_whole.py:162-167).

Per-person path (TPU-first redesign): the reference caches the projected
~4M-point fine grid per sequence and crops per person with dynamic shapes
(project_individual.py:192-293). Because the fine-grid pitch equals the
individual-cube pitch (project_individual.py:50), a person's cube voxel
centers are exactly `space_origin + (corner + j) * pitch` — so we reconstruct
positions from the snapped corner index and project them on the fly (cheap VPU
math), in fixed [max_people, 64^3] shapes, vmapped over people and views. The
reference's bbox mask and space-boundary crop become a per-voxel validity
mask (project_individual.py:262-286).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fvp_tpu.config import FVPConfig
from fvp_tpu.geometry.cameras import project_points_uv
from fvp_tpu.geometry.grids import RigConstants, to_sample_px_uv


def bilinear_sample(heatmap: jax.Array, x: jax.Array,
                    y: jax.Array) -> jax.Array:
    """Sample a (J, H, W) heatmap at pixel coords x (N,), y (N,) -> (J, N).

    align_corners pixel space: coordinate (x, y) = pixel center (x, y).
    Out-of-bounds corners contribute zero (torch zero-padding semantics).
    Coordinates are separate arrays (not (N, 2)) — see project_points_uv's
    TPU layout note.
    """
    J, H, W = heatmap.shape
    # CRITICAL TPU perf barrier: if XLA fuses upstream coordinate math into
    # the gather's fusion, the gather falls off its fast path (measured
    # 38 ms vs 0.05 ms for one person cube's samples). Materializing the
    # coordinates keeps the four corner gathers on the fast standalone path.
    x, y = jax.lax.optimization_barrier((x, y))
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = heatmap.reshape(J, H * W)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx, axis=1)          # (J, N)
        return vals * (w * valid.astype(heatmap.dtype))

    out = corner(x0i, y0i, (1.0 - wx1) * (1.0 - wy1))
    out += corner(x0i + 1, y0i, wx1 * (1.0 - wy1))
    out += corner(x0i, y0i + 1, (1.0 - wx1) * wy1)
    out += corner(x0i + 1, y0i + 1, wx1 * wy1)
    return out


def project_whole(heatmaps: jax.Array, rc: RigConstants,
                  cfg: FVPConfig) -> jax.Array:
    """Aggregate (V, J, H, W) view heatmaps into the whole-space voxel volume
    (nx, ny, nz, J), values clamped to [0, 1].

    The mean over views is an associative reduction — under view sharding it
    becomes a `psum` over the view mesh axis (see fvp_tpu/parallel/).
    """
    sampled = jax.vmap(
        lambda hm, px: bilinear_sample(hm, px[0], px[1])
    )(heatmaps, rc.whole_sample_px)
    volume = jnp.mean(sampled, axis=0)               # (J, nbins)
    volume = jnp.clip(volume, 0.0, 1.0)
    nx, ny, nz = cfg.voxels_per_axis
    return volume.reshape(heatmaps.shape[1], nx, ny, nz).transpose(1, 2, 3, 0)


def snap_centers(centers_mm: jax.Array, cfg: FVPConfig):
    """Snap proposal centers (P, 3) mm to fine-grid corner indices.

    Returns (corner (P,3) int32, offset (P,3) f32) where `offset` converts
    cube-local soft-argmax coords to world mm
    (reference project_individual.py:83-85, 255-258).
    """
    space = jnp.asarray(cfg.space_size, jnp.float32)
    center = jnp.asarray(cfg.space_center, jnp.float32)
    ind = jnp.asarray(cfg.ind_space_size, jnp.float32)
    fine = jnp.asarray(cfg.fine_voxels_per_axis, jnp.float32)
    scale = (fine - 1.0) / space
    bias = -ind / 2.0 / space * (fine - 1.0) - scale * (center - space / 2.0)
    corner = jnp.round(centers_mm * scale + bias).astype(jnp.int32)
    offset = corner.astype(jnp.float32) / (fine - 1.0) * space \
        - space / 2.0 + ind / 2.0
    return corner, offset


def _person_validity(corner: jax.Array, bbox: jax.Array, cfg: FVPConfig):
    """Per-axis [start, end) fine-index bounds for one person's cube
    (reference project_individual.py:262-274)."""
    ind_vox = jnp.asarray(cfg.ind_voxels_per_axis, jnp.int32)
    fine_vox = jnp.asarray(cfg.fine_voxels_per_axis, jnp.int32)
    mask_xy = ((1.0 - bbox) / 2.0
               * (jnp.asarray(cfg.ind_voxels_per_axis[:2], jnp.float32) - 1.0)
               ).astype(jnp.int32)
    mask_xy = jnp.maximum(mask_xy, 0)
    mask = jnp.concatenate([mask_xy, jnp.zeros((1,), jnp.int32)])
    start = jnp.maximum(corner + mask, 0)
    end = jnp.minimum(corner + ind_vox - mask, fine_vox)
    alive = jnp.all(start < end)   # reference skips the person otherwise
    return start, end, alive


def _cube_positions_uv(corner: jax.Array, cfg: FVPConfig):
    """World-mm positions of one person's cube voxels as three flattened
    (N,) coordinate arrays (x, y, z), N = X*Y*Z."""
    nx, ny, nz = cfg.ind_voxels_per_axis
    space = np.asarray(cfg.space_size, np.float32)
    centr = np.asarray(cfg.space_center, np.float32)
    fine = np.asarray(cfg.fine_voxels_per_axis, np.float32)
    pitch = space / (fine - 1.0)
    origin = centr - space / 2.0
    jx = jnp.arange(nx, dtype=jnp.float32)
    jy = jnp.arange(ny, dtype=jnp.float32)
    jz = jnp.arange(nz, dtype=jnp.float32)
    ax = origin[0] + (corner[0] + jx) * pitch[0]
    ay = origin[1] + (corner[1] + jy) * pitch[1]
    az = origin[2] + (corner[2] + jz) * pitch[2]
    px = jnp.broadcast_to(ax[:, None, None], (nx, ny, nz)).reshape(-1)
    py = jnp.broadcast_to(ay[None, :, None], (nx, ny, nz)).reshape(-1)
    pz = jnp.broadcast_to(az[None, None, :], (nx, ny, nz)).reshape(-1)
    return px, py, pz


def _sample_one_person(heatmaps, rc: RigConstants, cfg: FVPConfig,
                       corner, bbox):
    """(V, J, H, W) heatmaps -> one (X, Y, Z, J) cube for a person whose
    snapped cube corner is `corner` (3,) with bbox size fractions (2,)."""
    nx, ny, nz = cfg.ind_voxels_per_axis
    start, end, alive = _person_validity(corner, bbox, cfg)

    px, py, pz = _cube_positions_uv(corner, cfg)            # (N,) each

    def view_sample(R, T, f, c, k, p, hm):
        u, v = project_points_uv(px, py, pz, R, T, f, c, k, p)
        sx, sy = to_sample_px_uv(u, v, cfg, rc.hm_transform, xp=jnp)
        return bilinear_sample(hm, sx, sy)                  # (J, N)

    rig = rc.rig
    sampled = jax.vmap(view_sample)(rig.R, rig.T, rig.f, rig.c, rig.k,
                                    rig.p, heatmaps)
    cube = jnp.clip(jnp.mean(sampled, axis=0), 0.0, 1.0)    # (J, N)

    # validity: fine index (corner + j) within [start, end) on every axis
    fj = [corner[a] + jnp.arange((nx, ny, nz)[a]) for a in range(3)]
    vx = (fj[0] >= start[0]) & (fj[0] < end[0])
    vy = (fj[1] >= start[1]) & (fj[1] < end[1])
    vz = (fj[2] >= start[2]) & (fj[2] < end[2])
    valid = (vx[:, None, None] & vy[None, :, None] & vz[None, None, :]
             & alive)
    cube = cube.reshape(-1, nx, ny, nz) * valid.astype(cube.dtype)
    return cube.transpose(1, 2, 3, 0)                       # (X, Y, Z, J)


def sample_person_cubes(heatmaps: jax.Array, rc: RigConstants,
                        cfg: FVPConfig, centers_mm: jax.Array,
                        bbox: jax.Array):
    """Build all person cubes in one fixed-shape batch.

    heatmaps: (V, J, H, W); centers_mm: (P, 3); bbox: (P, 2) size fractions.
    Returns (cubes (P, X, Y, Z, J), offset (P, 3)).

    People are processed under lax.scan (sequential) rather than vmap: the
    fully-vmapped gather materializes a (P*V*64^3, J) buffer whose J-minor
    layout pads 8.5x on TPU (observed 25 GB of HBM temp for P=10, V=5).
    Sequential people bound the live set to one person's (J, 64^3) samples,
    which XLA lays out with the long axis minor (no padding blowup).
    """
    corner, offset = snap_centers(centers_mm, cfg)

    def body(carry, args):
        ctl, bb = args
        return carry, _sample_one_person(heatmaps, rc, cfg, ctl, bb)

    _, cubes = jax.lax.scan(body, None, (corner, bbox))
    return cubes, offset


def collapse_planes(cubes: jax.Array) -> jax.Array:
    """Tri-plane orthographic collapse of (P, X, Y, Z, J) cubes ->
    (3, P, A, B, J): xy = max over z, xz = max over y, yz = max over x
    (reference joint_localization_net.py:158-160)."""
    xy = jnp.max(cubes, axis=3)
    xz = jnp.max(cubes, axis=2)
    yz = jnp.max(cubes, axis=1)
    return jnp.stack([xy, xz, yz])
