"""MXU-formulated bilinear sampling: tiled patch-matmul instead of gather.

Why: XLA's TPU gather fetches one (J,)-row per index at memory latency
(~6 ns/row measured => ~7.6 ms per corner gather for one person's cube); the
JLN per-person path needs ~5M row fetches per frame, making gather the
pipeline bottleneck by far (~360 ms/frame).

Reformulation: bilinear interpolation is a tensor-product hat-function
weighting,

    out[j, s] = sum_{y, x} hm[j, y, x] * hat(sy_s - y) * hat(sx_s - x),
    hat(d) = max(0, 1 - |d|),

which is separable. Samples are grouped into spatially-coherent tiles
(subcubes of the person cube / voxel blocks of the whole space) whose
projections land in a small patch of the heatmap, so per tile:

    tmp[j, y, s] = sum_x patch[j, y, x] * wx[s, x]        (MXU matmul)
    out[j, s]    = sum_y tmp[j, y, s] * wy[s, y]          (VPU reduce)

with patch extracted around the tile's projected bounding box from a
zero-padded heatmap (zero padding reproduces grid_sample's out-of-bounds
semantics exactly — see fvp_tpu/ops/sampling.py for the contract).

Exactness: identical to gather-based bilinear whenever a tile's sample
supports fit its patch window (parity-tested). Tiles whose projected extent
exceeds the patch (only possible for voxels pathologically close to a
camera's image plane) contribute zeros for that view.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fvp_tpu.config import FVPConfig
from fvp_tpu.geometry.grids import RigConstants
from fvp_tpu.ops.sampling import _person_validity, snap_centers

# patch window (lanes x sublanes-ish; PW on the minor axis)
PATCH_H = 32
PATCH_W = 32
PAD = 8          # zero border around the heatmap


def pad_heatmaps(heatmaps: jax.Array) -> jax.Array:
    """(... , H, W) -> zero-padded (..., H + 2*PAD, W + 2*PAD)."""
    pad = [(0, 0)] * (heatmaps.ndim - 2) + [(PAD, PAD), (PAD, PAD)]
    return jnp.pad(heatmaps, pad)


OCC_BY = 8       # occupancy block: 8 heatmap rows ...
OCC_BX = 32      # ... x 32 columns, one bit per block


def occupancy_rows(padded_hm: jax.Array) -> jax.Array:
    """(NB, V, J, Hp, Wp) padded heatmaps -> (NB, V, ceil(Hp/8)) int32
    bitmasks: bit k of row r = 1 iff any channel of the 8x32 block
    (rows 8r.., cols 32k..) is nonzero.

    Input heatmaps are sparse (Gaussian blobs on a zero field), so most
    of a sampled voxel tile's support patches are exactly zero in most
    views; the sampler kernels test this per (tile, view) with three SMEM
    scalar reads and skip the matmul — an EXACT skip (a zero patch
    contributes zero to the view mean)."""
    NB, V, J, Hp, Wp = padded_hm.shape
    yp = (-Hp) % OCC_BY
    xp = (-Wp) % OCC_BX
    m = jnp.pad(jnp.max(jnp.abs(padded_hm), axis=2), (
        (0, 0), (0, 0), (0, yp), (0, xp)))
    NYB, NXB = (Hp + yp) // OCC_BY, (Wp + xp) // OCC_BX
    assert NXB <= 31, (Wp, NXB)   # one int32 bitmask per 8-row stripe
    blocks = m.reshape(NB, V, NYB, OCC_BY, NXB, OCC_BX).max(axis=(3, 5))
    bits = (blocks > 0).astype(jnp.int32) << jnp.arange(NXB, dtype=jnp.int32)
    return jnp.sum(bits, axis=-1).astype(jnp.int32)     # (NB, V, NYB)


def _clamp_coords(x, lo: float, hi: float):
    """Pin far-out-of-image coords near the border. Output-equivalent to the
    reference's +-1.1 normalized clamp: any coordinate <= -1 or >= size
    samples zero either way, but pinning close keeps tile extents small."""
    return jnp.clip(x, lo, hi)


def tiled_bilinear(padded_hm: jax.Array, sx: jax.Array, sy: jax.Array,
                   compute_dtype=jnp.float32) -> jax.Array:
    """padded_hm: (J, H + 2*PAD, W + 2*PAD); sx, sy: (T, S) heatmap-space
    pixel coords (unpadded frame). Returns (T, J, S)."""
    J, Hp, Wp = padded_hm.shape
    H, W = Hp - 2 * PAD, Wp - 2 * PAD
    T, S = sx.shape

    sx = _clamp_coords(sx, -2.0, W + 1.0)
    sy = _clamp_coords(sy, -2.0, H + 1.0)

    # per-tile patch origin, clamped so the window stays inside the padding
    ox = jnp.floor(jnp.min(sx, axis=1)) - 1.0
    oy = jnp.floor(jnp.min(sy, axis=1)) - 1.0
    ox = jnp.clip(ox, -PAD, W + PAD - PATCH_W)
    oy = jnp.clip(oy, -PAD, H + PAD - PATCH_H)

    lx = sx - ox[:, None]                       # (T, S) in [0, PATCH_W)
    ly = sy - oy[:, None]

    dx = jnp.arange(PATCH_W, dtype=sx.dtype)
    dy = jnp.arange(PATCH_H, dtype=sx.dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(lx[:, :, None] - dx))  # (T, S, PW)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(ly[:, :, None] - dy))  # (T, S, PH)

    oxi = (ox + PAD).astype(jnp.int32)
    oyi = (oy + PAD).astype(jnp.int32)

    def per_tile(oxi_t, oyi_t, wx_t, wy_t):
        patch = jax.lax.dynamic_slice(
            padded_hm, (0, oyi_t, oxi_t), (J, PATCH_H, PATCH_W))
        tmp = jnp.einsum("jyx,sx->jys", patch.astype(compute_dtype),
                         wx_t.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
        return jnp.einsum("jys,sy->js", tmp, wy_t.astype(jnp.float32))

    out = jax.vmap(per_tile)(oxi, oyi, wx, wy)  # (T, J, S)
    return out


def _tile_positions(corner, cfg: FVPConfig, tile=(8, 8, 4)):
    """Cube voxel world positions arranged in (T, S) tile order.

    Tile order: tiles enumerated C-order over (X/tx, Y/ty, Z/tz); within a
    tile, C-order over (tx, ty, tz). Returns (px, py, pz) each (T, S) and the
    shape metadata for scattering back into (X, Y, Z)."""
    nx, ny, nz = cfg.ind_voxels_per_axis
    tx, ty, tz = tile
    space = np.asarray(cfg.space_size, np.float32)
    centr = np.asarray(cfg.space_center, np.float32)
    fine = np.asarray(cfg.fine_voxels_per_axis, np.float32)
    pitch = space / (fine - 1.0)
    origin = centr - space / 2.0

    gx = origin[0] + (corner[0] + jnp.arange(nx, dtype=jnp.float32)) * pitch[0]
    gy = origin[1] + (corner[1] + jnp.arange(ny, dtype=jnp.float32)) * pitch[1]
    gz = origin[2] + (corner[2] + jnp.arange(nz, dtype=jnp.float32)) * pitch[2]

    # (X, Y, Z) -> (Tx, tx, Ty, ty, Tz, tz) -> (Tx, Ty, Tz, tx, ty, tz)
    def tile_axis(g, n, t):
        return g.reshape(n // t, t)

    gx_t = tile_axis(gx, nx, tx)        # (Tx, tx)
    gy_t = tile_axis(gy, ny, ty)
    gz_t = tile_axis(gz, nz, tz)
    Tx, Ty, Tz = nx // tx, ny // ty, nz // tz
    T, S = Tx * Ty * Tz, tx * ty * tz

    px = jnp.broadcast_to(gx_t[:, None, None, :, None, None],
                          (Tx, Ty, Tz, tx, ty, tz)).reshape(T, S)
    py = jnp.broadcast_to(gy_t[None, :, None, None, :, None],
                          (Tx, Ty, Tz, tx, ty, tz)).reshape(T, S)
    pz = jnp.broadcast_to(gz_t[None, None, :, None, None, :],
                          (Tx, Ty, Tz, tx, ty, tz)).reshape(T, S)
    return px, py, pz, (Tx, Ty, Tz, tx, ty, tz)


def _untile(out, tdims, num_joints):
    """(T, J, S) -> (X, Y, Z, J)."""
    Tx, Ty, Tz, tx, ty, tz = tdims
    out = out.reshape(Tx, Ty, Tz, num_joints, tx, ty, tz)
    out = out.transpose(0, 4, 1, 5, 2, 6, 3)
    return out.reshape(Tx * tx, Ty * ty, Tz * tz, num_joints)


def _tile_validity(corner, bbox, cfg: FVPConfig, tdims):
    """Per-tile compute mask for one person: tile overlaps the bbox-cropped
    valid voxel range on every axis (and the person's crop is non-empty)."""
    Tx, Ty, Tz, tx, ty, tz = tdims
    start, end, alive = _person_validity(corner, bbox, cfg)
    lo = start - corner                       # cube-local valid [lo, hi)
    hi = end - corner

    def axis_mask(nT, t, a):
        t0 = jnp.arange(nT) * t
        return (t0 + t > lo[a]) & (t0 < hi[a])

    vx = axis_mask(Tx, tx, 0)
    vy = axis_mask(Ty, ty, 1)
    vz = axis_mask(Tz, tz, 2)
    v = (vx[:, None, None] & vy[None, :, None] & vz[None, None, :] & alive)
    return v.reshape(-1)


def _person_geom(cfg: FVPConfig, tile) -> tuple:
    """Static geometry tuple for the in-kernel projection path (see
    ops/pallas/sampler.py _step_coords): person-cube tile dims + the fine
    voxel grid's pitch/origin (f32, matching _tile_positions exactly) +
    the to_sample_px clamp constants."""
    nx, ny, nz = cfg.ind_voxels_per_axis
    tx, ty, tz = tile
    space = np.asarray(cfg.space_size, np.float32)
    centr = np.asarray(cfg.space_center, np.float32)
    fine = np.asarray(cfg.fine_voxels_per_axis, np.float32)
    pitch = space / (fine - np.float32(1.0))
    origin = centr - space / np.float32(2.0)
    w, h = cfg.heatmap_size
    return (nx // tx, ny // ty, nz // tz, tx, ty, tz,
            float(pitch[0]), float(pitch[1]), float(pitch[2]),
            float(origin[0]), float(origin[1]), float(origin[2]),
            float(max(cfg.ori_image_size)), float(w - 1.0), float(h - 1.0))


def _pack_cam_params(rig, hm_t) -> jax.Array:
    """(V, 27) f32 packed per-view camera parameters + the image->heatmap
    affine, the SMEM-resident input of the in-kernel projection."""
    V = rig.R.shape[0]
    hm6 = jnp.broadcast_to(
        jnp.asarray(hm_t, jnp.float32).reshape(1, 6), (V, 6))
    return jnp.concatenate([
        jnp.asarray(rig.R, jnp.float32).reshape(V, 9),
        jnp.asarray(rig.T, jnp.float32).reshape(V, 3),
        jnp.asarray(rig.f, jnp.float32).reshape(V, 2),
        jnp.asarray(rig.c, jnp.float32).reshape(V, 2),
        jnp.asarray(rig.k, jnp.float32).reshape(V, 3),
        jnp.asarray(rig.p, jnp.float32).reshape(V, 2),
        hm6], axis=1)


def sample_person_cubes_pallas(heatmaps: jax.Array, rc: RigConstants,
                               cfg: FVPConfig, centers_mm: jax.Array,
                               bbox: jax.Array, person_mask=None,
                               tile=(8, 4, 4), band_height: int = 32,
                               interpret: bool = False,
                               hm_dtype=jnp.bfloat16):
    """Pallas-kernel person-cube sampler (fvp_tpu/ops/pallas/sampler.py):
    voxel tiles are projected in-kernel (VPU) from the person's cube
    corner + packed camera params, then bilinearly sampled on the MXU.
    Same contract as sample_person_cubes."""
    from fvp_tpu.ops.pallas.sampler import pallas_tiled_sample_project

    V, J = heatmaps.shape[:2]
    nx, ny, nz = cfg.ind_voxels_per_axis
    P = centers_mm.shape[0]
    corner, offset = snap_centers(centers_mm, cfg)
    padded = pad_heatmaps(heatmaps)

    tx, ty, tz = tile
    tdims = (nx // tx, ny // ty, nz // tz, tx, ty, tz)
    T = tdims[0] * tdims[1] * tdims[2]
    S = tx * ty * tz

    tile_valid = jax.vmap(
        lambda ctl, bb: _tile_validity(ctl, bb, cfg, tdims))(corner, bbox)
    if person_mask is not None:
        tile_valid = tile_valid & person_mask[:, None]

    out = pallas_tiled_sample_project(
        padded[None], corner, _pack_cam_params(rc.rig, rc.hm_transform),
        tile_valid, T, S, _person_geom(cfg, tile),
        PH=band_height, people_per_item=P, interpret=interpret,
        hm_dtype=hm_dtype)                            # (P, T, J, S)

    def finalize(out_p, ctl, bb):
        cube = _untile(out_p, tdims, J)
        start, end, alive = _person_validity(ctl, bb, cfg)
        fx = ctl[0] + jnp.arange(nx)
        fy = ctl[1] + jnp.arange(ny)
        fz = ctl[2] + jnp.arange(nz)
        valid = ((fx >= start[0]) & (fx < end[0]))[:, None, None] \
            & ((fy >= start[1]) & (fy < end[1]))[None, :, None] \
            & ((fz >= start[2]) & (fz < end[2]))[None, None, :] \
            & alive
        return cube * valid[..., None].astype(cube.dtype)

    cubes = jax.vmap(finalize)(out, corner, bbox)
    return cubes, offset


def project_whole_pallas(heatmaps: jax.Array, rc: RigConstants,
                         cfg: FVPConfig, tile=(4, 4, 4),
                         band_height: int = 64,
                         interpret: bool = False,
                         hm_dtype=jnp.bfloat16) -> jax.Array:
    """Whole-space aggregation through the Pallas sampler:
    (V, J, H, W) -> (nx, ny, nz, J) in [0, 1]."""
    from fvp_tpu.ops.pallas.sampler import pallas_tiled_sample

    V, J = heatmaps.shape[:2]
    nx, ny, nz = cfg.voxels_per_axis
    tx, ty, tz = tile
    Tx, Ty, Tz = nx // tx, ny // ty, nz // tz
    T, S = Tx * Ty * Tz, tx * ty * tz

    def retile(coords):
        c = coords.reshape(Tx, tx, Ty, ty, Tz, tz)
        return c.transpose(0, 2, 4, 1, 3, 5).reshape(T, S)

    sx = jax.vmap(lambda px_v: retile(px_v[0]))(rc.whole_sample_px)
    sy = jax.vmap(lambda px_v: retile(px_v[1]))(rc.whole_sample_px)
    sx = sx.transpose(1, 0, 2)[None]                  # (1, T, V, S)
    sy = sy.transpose(1, 0, 2)[None]

    valid = jnp.ones((1, T), jnp.int32)
    out = pallas_tiled_sample(pad_heatmaps(heatmaps)[None], sx, sy, valid,
                              PH=band_height, interpret=interpret,
                              hm_dtype=hm_dtype)
    vol = out[0].transpose(0, 2, 1)                   # (T, S, J)
    vol = vol.reshape(Tx, Ty, Tz, tx, ty, tz, J)
    vol = vol.transpose(0, 3, 1, 4, 2, 5, 6)
    return vol.reshape(nx, ny, nz, J)


def project_whole_pallas_batched(heatmaps: jax.Array, rc: RigConstants,
                                 cfg: FVPConfig, tile=(4, 4, 4),
                                 band_height: int = 64,
                                 interpret: bool = False,
                                 hm_dtype=jnp.bfloat16) -> jax.Array:
    """(B, V, J, H, W) -> (B, nx, ny, nz, J): batched whole-space
    aggregation (per-frame heatmaps, shared precomputed coords)."""
    from fvp_tpu.ops.pallas.sampler import pallas_tiled_sample

    B, V, J = heatmaps.shape[:3]
    nx, ny, nz = cfg.voxels_per_axis
    tx, ty, tz = tile
    Tx, Ty, Tz = nx // tx, ny // ty, nz // tz
    T, S = Tx * Ty * Tz, tx * ty * tz

    def retile(coords):
        c = coords.reshape(Tx, tx, Ty, ty, Tz, tz)
        return c.transpose(0, 2, 4, 1, 3, 5).reshape(T, S)

    sx = jax.vmap(lambda px_v: retile(px_v[0]))(rc.whole_sample_px)
    sy = jax.vmap(lambda px_v: retile(px_v[1]))(rc.whole_sample_px)
    sx = jnp.broadcast_to(sx.transpose(1, 0, 2)[None], (B, T, V, S))
    sy = jnp.broadcast_to(sy.transpose(1, 0, 2)[None], (B, T, V, S))

    valid = jnp.ones((B, T), jnp.int32)
    out = pallas_tiled_sample(pad_heatmaps(heatmaps), sx, sy, valid,
                              PH=band_height, people_per_item=1,
                              interpret=interpret,
                              hm_dtype=hm_dtype)      # (B, T, J, S)
    vol = out.transpose(0, 1, 3, 2)                   # (B, T, S, J)
    vol = vol.reshape(B, Tx, Ty, Tz, tx, ty, tz, J)
    vol = vol.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return vol.reshape(B, nx, ny, nz, J)


def sample_person_planes_pallas_batched(heatmaps: jax.Array,
                                        rc: RigConstants, cfg: FVPConfig,
                                        centers_mm: jax.Array,
                                        bbox: jax.Array, person_mask=None,
                                        tile=(8, 4, 4),
                                        band_height: int = 32,
                                        interpret: bool = False,
                                        hm_dtype=jnp.bfloat16,
                                        fused: bool = False):
    """Fused JLN sampling + tri-plane collapse: the planes are reduced
    straight from the kernel's tiled output, so the (K, 64^3, J) cubes are
    never materialized in (X, Y, Z) order (saves ~7 ms/frame of transposes
    and cube-sized max reductions on chip).

    Returns (planes (3, B*K, A, B, J), offsets (B, K, 3)) with planes[0] =
    xy (max over z), [1] = xz, [2] = yz — identical to
    collapse_planes(sample_person_cubes...)."""
    from fvp_tpu.ops.pallas.sampler import pallas_tiled_sample_project

    B, V, J = heatmaps.shape[:3]
    K = centers_mm.shape[1]
    nx, ny, nz = cfg.ind_voxels_per_axis
    tx, ty, tz = tile
    Tx, Ty, Tz = nx // tx, ny // ty, nz // tz
    tdims = (Tx, Ty, Tz, tx, ty, tz)
    P = B * K

    corner, offset = snap_centers(centers_mm.reshape(P, 3), cfg)
    padded = pad_heatmaps(heatmaps)

    flat_bbox = bbox.reshape(P, 2)
    tile_valid = jax.vmap(
        lambda ctl, bb: _tile_validity(ctl, bb, cfg, tdims))(
            corner, flat_bbox)
    if person_mask is not None:
        tile_valid = tile_valid & person_mask.reshape(P)[:, None]

    def person_bounds(ctl, bb):
        start, end, alive = _person_validity(ctl, bb, cfg)
        end = jnp.where(alive, end, start)     # dead person: empty range
        return start, end

    start, end = jax.vmap(person_bounds)(corner, flat_bbox)

    if fused:
        # v2: single-launch sample+collapse — the (P, T, J, S) tiled
        # tensor never reaches HBM (ops/pallas/sampler.py
        # pallas_tiled_sample_project_collapse); bitwise-identical
        # partials, same XLA finish
        from fvp_tpu.ops.pallas.collapse import finish_plane_partials
        from fvp_tpu.ops.pallas.sampler import (
            pallas_tiled_sample_project_collapse,
        )

        oxy, oxz, oyz = pallas_tiled_sample_project_collapse(
            padded, corner, _pack_cam_params(rc.rig, rc.hm_transform),
            tile_valid, start, end, _person_geom(cfg, tile), tdims,
            PH=band_height, people_per_item=K, interpret=interpret,
            hm_dtype=hm_dtype, out_dtype=hm_dtype)
        xy, xz, yz = finish_plane_partials(oxy, oxz, oyz, tdims)
        planes = jnp.stack([xy, xz, yz]).astype(jnp.float32)
        return planes, offset.reshape(B, K, 3)

    out = pallas_tiled_sample_project(
        padded, corner, _pack_cam_params(rc.rig, rc.hm_transform),
        tile_valid, Tx * Ty * Tz, tx * ty * tz, _person_geom(cfg, tile),
        PH=band_height, people_per_item=K, interpret=interpret,
        hm_dtype=hm_dtype, out_dtype=hm_dtype)        # (P, T, J, S)

    # two-launch v1: sampler + masked tri-plane collapse over the tiled
    # tensor (the XLA relayout + three full reductions cost ~3.6 ms/frame
    # at flagship shapes — see ops/pallas/collapse.py)
    from fvp_tpu.ops.pallas.collapse import collapse_planes_pallas

    xy, xz, yz = collapse_planes_pallas(
        out, start, end, corner, (Tx, Ty, Tz, tx, ty, tz), J,
        interpret=interpret)
    planes = jnp.stack([xy, xz, yz]).astype(jnp.float32)
    return planes, offset.reshape(B, K, 3)


def sample_person_cubes_pallas_batched(heatmaps: jax.Array,
                                       rc: RigConstants, cfg: FVPConfig,
                                       centers_mm: jax.Array,
                                       bbox: jax.Array, person_mask=None,
                                       tile=(8, 4, 4),
                                       band_height: int = 32,
                                       interpret: bool = False,
                                       hm_dtype=jnp.bfloat16):
    """Batched JLN sampling: heatmaps (B, V, J, H, W), centers (B, K, 3),
    bbox (B, K, 2), person_mask (B, K) bool (unmatched proposals are
    skipped — zeros — matching the reference's masked loop,
    joint_localization_net.py:148-151).
    Returns (cubes (B, K, X, Y, Z, J), offsets (B, K, 3))."""
    from fvp_tpu.ops.pallas.sampler import pallas_tiled_sample_project

    B, V, J = heatmaps.shape[:3]
    K = centers_mm.shape[1]
    nx, ny, nz = cfg.ind_voxels_per_axis
    tx, ty, tz = tile
    tdims = (nx // tx, ny // ty, nz // tz, tx, ty, tz)

    corner, offset = snap_centers(
        centers_mm.reshape(B * K, 3), cfg)            # (B*K, 3)
    padded = pad_heatmaps(heatmaps)

    flat_bbox = bbox.reshape(B * K, 2)
    tile_valid = jax.vmap(
        lambda ctl, bb: _tile_validity(ctl, bb, cfg, tdims))(
            corner, flat_bbox)
    if person_mask is not None:
        tile_valid = tile_valid & person_mask.reshape(B * K)[:, None]

    out = pallas_tiled_sample_project(
        padded, corner, _pack_cam_params(rc.rig, rc.hm_transform),
        tile_valid, tdims[0] * tdims[1] * tdims[2], tx * ty * tz,
        _person_geom(cfg, tile),
        PH=band_height, people_per_item=K, interpret=interpret,
        hm_dtype=hm_dtype)

    def finalize(out_p, ctl, bb):
        cube = _untile(out_p, tdims, J)
        start, end, alive = _person_validity(ctl, bb, cfg)
        fx = ctl[0] + jnp.arange(nx)
        fy = ctl[1] + jnp.arange(ny)
        fz = ctl[2] + jnp.arange(nz)
        valid = ((fx >= start[0]) & (fx < end[0]))[:, None, None] \
            & ((fy >= start[1]) & (fy < end[1]))[None, :, None] \
            & ((fz >= start[2]) & (fz < end[2]))[None, None, :] \
            & alive
        return cube * valid[..., None].astype(cube.dtype)

    cubes = jax.vmap(finalize)(out, corner, flat_bbox)
    return (cubes.reshape(B, K, nx, ny, nz, J),
            offset.reshape(B, K, 3))


