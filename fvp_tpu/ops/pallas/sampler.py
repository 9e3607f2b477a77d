"""Pallas TPU kernel: fused multi-view bilinear voxel sampling on the MXU.

The hot op of the whole engine: sample every view's (J, H, W) heatmap at the
projected positions of a tile of voxels, average over views, clamp — the
reference's grid_sample+mean (project_whole.py:162, project_individual.py:283)
as one kernel.

Formulation (see fvp_tpu/ops/fast_sampling.py for the math): bilinear
interpolation is a separable hat-function weighting. Per voxel tile of S
spatially-coherent samples and per view:

    wxT[x, s] = hat(sx_s - x)                 built directly transposed
    wyT[y, s] = hat(sy_s - (oy + y))          (no in-kernel transposes)
    band      = hm[v, :, oy:oy+PH, :]         8-aligned sublane slice
    t1        = band.reshape(J*PH, W) @ wxT               # MXU
    out      += sum_y t1.reshape(J, PH, S) * wyT[None]    # VPU reduce

TPU constraints shape the design: dynamic VMEM slices must be 8-aligned on
the sublane (y) axis and 128-aligned on the lane (x) axis, so the patch is a
full-width y-band whose origin is aligned down to 8 (PH carries an 8-row
margin). The x hat-window rides the matmul contraction instead — its cost is
hidden by MXU lane parallelism.

Per-tile work skipping: a scalar-prefetched validity mask (person matched x
tile inside the person's bbox crop) zeroes dead tiles without computing them
— the batched-fixed-shape analog of the reference's dynamic per-person crop
(project_individual.py:262-286) and skip of unmatched proposals
(joint_localization_net.py:148-151).

Why not gather: XLA's TPU gather fetches one row per index at ~6 ns — the
per-person path needs ~5M fetches/frame (=> ~360 ms measured). Here the same
work is dense MXU matmul + tiny VPU reductions.

All views' padded heatmaps stay resident in VMEM across the whole grid
(f32 Panoptic shape: 5*15*144*256*4B = 11 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fvp_tpu.ops.fast_sampling import PAD


def _support_occupied(occ_ref, frame, v, sx, sy, NYB):
    """Exact per-(tile, view) skip test: 1 iff any 8x32 occupancy block
    (fast_sampling.occupancy_rows) overlapping the tile's bilinear support
    rectangle is nonzero. Conservative on every edge case (range overflow,
    off-table coords => occupied), so a 0 means the patch is ALL ZERO and
    the view's matmul can be skipped without changing the output."""
    ry0 = jnp.floor(jnp.min(sy)).astype(jnp.int32)
    ry1 = jnp.floor(jnp.max(sy)).astype(jnp.int32) + 1
    rx0 = jnp.floor(jnp.min(sx)).astype(jnp.int32)
    rx1 = jnp.floor(jnp.max(sx)).astype(jnp.int32) + 1
    by0, by1 = ry0 // 8, ry1 // 8
    bx0, bx1 = rx0 // 32, rx1 // 32
    width = bx1 - bx0 + 1

    over = ((by1 - by0 > 2) | (width > 30) | (ry0 < 0) | (rx0 < 0))
    wclamp = jnp.clip(width, 1, 30)
    mask = ((jnp.int32(1) << wclamp) - 1) << jnp.clip(bx0, 0, 30)

    hit = jnp.int32(0)
    for dy in range(3):
        yb = by0 + dy
        row = occ_ref[frame, v, jnp.clip(yb, 0, NYB - 1)]
        hit = hit | jnp.where(yb <= by1, row & mask, 0)
    return (hit != 0) | over


def _one_tile_from(coords, hm_ref, num_views, PH, Hp, Wp, NW, J, S,
                   occs=None):
    """coords: per-view list of ((1, S) sx, (1, S) sy) PADDED-frame pixel
    coordinate values (PAD already added).

    hm_ref carries NW x-WINDOWS of the padded heatmap concatenated on the
    lane axis (see _window_heatmaps): window k = source lanes
    [min(64k, Wp-128), +128). Per tile and view the kernel picks the
    window containing the tile's x-support with ONE dynamic lane slice —
    the offset w*128 is 128-lane-aligned by construction, which is what
    makes a dynamic x-band legal on the lane axis at all — halving the
    matmul contraction (and the hat build) vs contracting the full padded
    width. Supports wider than ~64 px can spill the window and lose
    their right-side taps: the same pathologically-close-voxel class as
    the PH y-band (documented at pallas_tiled_sample), bounded by the
    same production A/B."""
    WB = hm_ref.shape[-1] if NW == 1 else 128

    def one_view(v, acc):
        sx, sy = coords[v]                         # (1, S), padded frame

        oy = jnp.floor(jnp.min(sy)) - 1.0
        oy = jnp.clip(oy, 0.0, Hp - PH)
        # align the band origin down to the sublane tile (8 rows); PH's
        # margin guarantees the hat supports stay inside the band
        oyi = (oy.astype(jnp.int32) // 8) * 8
        ly = sy - oyi.astype(jnp.float32)

        if NW == 1:
            lx = sx
            band = hm_ref[0, v, :, pl.ds(oyi, PH), :]      # (J, PH, WB)
        else:
            xmin = jnp.floor(jnp.min(sx)).astype(jnp.int32)
            w = jnp.clip(xmin // 64, 0, NW - 1)
            start = jnp.minimum(64 * w, Wp - 128)
            lx = sx - start.astype(jnp.float32)
            band = hm_ref[0, v, :, pl.ds(oyi, PH),
                          pl.ds(w * 128, 128)]             # (J, PH, 128)

        iw = jax.lax.broadcasted_iota(
            jnp.int32, (WB, S), 0).astype(jnp.float32)
        iy = jax.lax.broadcasted_iota(
            jnp.int32, (PH, S), 0).astype(jnp.float32)
        wxT = jnp.maximum(0.0, 1.0 - jnp.abs(
            jnp.broadcast_to(lx, (WB, S)) - iw))   # (WB, S)
        wyT = jnp.maximum(0.0, 1.0 - jnp.abs(
            jnp.broadcast_to(ly, (PH, S)) - iy))   # (PH, S)

        # with bf16 heatmaps (default): bf16 x bf16 -> f32, matching the
        # MXU's default-precision path for f32 operands at half the VMEM
        # footprint for the resident heatmaps
        t1 = jax.lax.dot_general(
            band.reshape(J * PH, WB), wxT.astype(band.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (J*PH, S)
        return acc + jnp.sum(
            t1.reshape(J, PH, S) * wyT[None, :, :], axis=1)    # (J, S)

    acc = jnp.zeros((J, S), jnp.float32)
    for v in range(num_views):
        if occs is None:
            acc = one_view(v, acc)
        else:
            # exact skip: a view whose support patch is all zero
            # contributes zero to the mean (see _support_occupied).
            # MEASURED LOSS on v5e (microbench_r4, 2026-08-20): carrying
            # the (J, S) accumulator through scf.if breaks Mosaic's matmul
            # pipelining — person sampler 8.4 -> 13.3 ms on sparse scene
            # inputs, 8.4 -> 20.9 ms dense. Default OFF; kept for
            # hardware/compilers with cheap divergence.
            acc = jax.lax.cond(occs[v], functools.partial(one_view, v),
                               lambda a: a, acc)
    return jnp.clip(acc / num_views, 0.0, 1.0)


def _sampler_kernel(valid_ref, occ_ref, sx_ref, sy_ref, hm_ref, out_ref, *,
                    num_views, PH, NW, Wp, K, use_occ):
    """Grid step = NT voxel tiles (batched to amortize per-step overhead).
    valid_ref: scalar-prefetched (P, T) int32 tile mask; occ_ref:
    scalar-prefetched (NB, V, NYB) int32 occupancy bitmasks
    (fast_sampling.occupancy_rows; None-shaped (NB, V, 0) disables);
    sx_ref/sy_ref blocks (1, NT, V, S); hm_ref block (1, V, J, Hp, NW*128
    windowed lanes — see _window_heatmaps; Wp = pre-windowing padded
    width) [the owning frame's heatmaps, VMEM-resident];
    out_ref (1, NT, J, S)."""
    J = hm_ref.shape[2]
    Hp = hm_ref.shape[3]
    NT = sx_ref.shape[1]
    S = sx_ref.shape[3]
    NYB = occ_ref.shape[2]
    p = pl.program_id(0)
    tg = pl.program_id(1)

    for nt in range(NT):
        valid = valid_ref[p, tg * NT + nt] > 0
        coords = [(sx_ref[0, nt, v:v + 1, :] + PAD,
                   sy_ref[0, nt, v:v + 1, :] + PAD)
                  for v in range(num_views)]
        occs = None
        if use_occ:
            occs = [_support_occupied(occ_ref, p // K, v, sx, sy, NYB)
                    for v, (sx, sy) in enumerate(coords)]

        @pl.when(valid)
        def _():
            out_ref[0, nt] = _one_tile_from(coords, hm_ref, num_views, PH,
                                            Hp, Wp, NW, J, S, occs=occs
                                            ).astype(out_ref.dtype)

        @pl.when(jnp.logical_not(valid))
        def _():
            out_ref[0, nt] = jnp.zeros((J, S), out_ref.dtype)


def _step_coords(corner_ref, cam_ref, p, tg, *, NT, S, num_views, geom):
    """VPU projection of one grid step's NT voxel tiles through every view.

    Replaces the XLA-side coordinate precompute (the (P, T, V, S) f32
    sx/sy tensors cost ~105 MB of HBM round-trip per frame at flagship
    shapes); here the same math — fvp_tpu/geometry/cameras.py
    project_points_uv + grids.py to_sample_px_uv, kept expression-for-
    expression identical — runs on (NT, S) vectors from ~30 SMEM scalars.

    corner_ref: (P, 3) int32 fine-grid cube corners (scalar-prefetched);
    cam_ref: (V, 27) f32 packed [R(9) row-major, T(3), f(2), c(2), k(3),
    p(2), hm_transform(6) row-major];
    geom: static (Tx, Ty, Tz, tx, ty, tz, pitch xyz, origin xyz, bound,
    w-1, h-1).
    Returns per-view [((NT, S) sx, (NT, S) sy)] in the UNPADDED heatmap
    frame (same contract as the precomputed-coords inputs)."""
    (Tx, Ty, Tz, tx, ty, tz, p0, p1, p2, o0, o1, o2,
     bound, wm1, hm1) = geom
    rows = jax.lax.broadcasted_iota(jnp.int32, (NT, S), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (NT, S), 1)
    t = tg * NT + rows
    tx_i = t // (Ty * Tz)
    ty_i = (t // Tz) % Ty
    tz_i = t % Tz
    ix = lane // (ty * tz)
    iy = (lane // tz) % ty
    iz = lane % tz

    c0 = corner_ref[p, 0]
    c1 = corner_ref[p, 1]
    c2 = corner_ref[p, 2]
    # world-mm voxel positions (matches fast_sampling._tile_positions:
    # origin + (corner + fine_index) * pitch)
    px = o0 + (c0 + tx_i * tx + ix).astype(jnp.float32) * p0
    py = o1 + (c1 + ty_i * ty + iy).astype(jnp.float32) * p1
    pz = o2 + (c2 + tz_i * tz + iz).astype(jnp.float32) * p2

    out = []
    for v in range(num_views):
        R00, R01, R02 = cam_ref[v, 0], cam_ref[v, 1], cam_ref[v, 2]
        R10, R11, R12 = cam_ref[v, 3], cam_ref[v, 4], cam_ref[v, 5]
        R20, R21, R22 = cam_ref[v, 6], cam_ref[v, 7], cam_ref[v, 8]
        T0, T1, T2 = cam_ref[v, 9], cam_ref[v, 10], cam_ref[v, 11]
        f0, f1 = cam_ref[v, 12], cam_ref[v, 13]
        cx, cy = cam_ref[v, 14], cam_ref[v, 15]
        k0, k1, k2 = cam_ref[v, 16], cam_ref[v, 17], cam_ref[v, 18]
        q0, q1 = cam_ref[v, 19], cam_ref[v, 20]
        h00, h01, h02 = cam_ref[v, 21], cam_ref[v, 22], cam_ref[v, 23]
        h10, h11, h12 = cam_ref[v, 24], cam_ref[v, 25], cam_ref[v, 26]

        # cameras.project_points_uv
        wx, wy, wz = px - T0, py - T1, pz - T2
        xc = R00 * wx + R01 * wy + R02 * wz
        yc = R10 * wx + R11 * wy + R12 * wz
        zc = R20 * wx + R21 * wy + R22 * wz + 1e-5
        yx = xc / zc
        yy = yc / zc
        r2 = yx * yx + yy * yy
        d = 1.0 + r2 * (k0 + r2 * (k1 + r2 * k2))
        du = yx * d + 2.0 * q0 * yx * yy + q1 * (r2 + 2.0 * yx * yx)
        dv = yy * d + 2.0 * q1 * yx * yy + q0 * (r2 + 2.0 * yy * yy)
        u = f0 * du + cx
        vv = f1 * dv + cy

        # grids.to_sample_px_uv
        u = jnp.clip(u, -1.0, bound)
        vv = jnp.clip(vv, -1.0, bound)
        x = h00 * u + h01 * vv + h02
        y = h10 * u + h11 * vv + h12
        gx = jnp.clip(x / wm1 * 2.0 - 1.0, -1.1, 1.1)
        gy = jnp.clip(y / hm1 * 2.0 - 1.0, -1.1, 1.1)
        out.append(((gx + 1.0) * 0.5 * wm1, (gy + 1.0) * 0.5 * hm1))
    return out


def _sampler_project_kernel(valid_ref, corner_ref, cam_ref, occ_ref,
                            hm_ref, out_ref,
                            *, num_views, PH, NW, Wp, geom, K, use_occ):
    """Like _sampler_kernel, but computes the sample coordinates in-kernel
    from the scalar-prefetched cube corners + camera parameters instead of
    streaming precomputed (P, T, V, S) coordinate tensors from HBM."""
    J = hm_ref.shape[2]
    Hp = hm_ref.shape[3]
    NT = out_ref.shape[1]
    S = out_ref.shape[3]
    NYB = occ_ref.shape[2]
    p = pl.program_id(0)
    tg = pl.program_id(1)

    step = _step_coords(corner_ref, cam_ref, p, tg, NT=NT, S=S,
                        num_views=num_views, geom=geom)

    for nt in range(NT):
        valid = valid_ref[p, tg * NT + nt] > 0
        coords = [(sx[nt:nt + 1, :] + PAD, sy[nt:nt + 1, :] + PAD)
                  for sx, sy in step]
        occs = None
        if use_occ:
            occs = [_support_occupied(occ_ref, p // K, v, sx, sy, NYB)
                    for v, (sx, sy) in enumerate(coords)]

        @pl.when(valid)
        def _():
            out_ref[0, nt] = _one_tile_from(coords, hm_ref, num_views, PH,
                                            Hp, Wp, NW, J, S, occs=occs
                                            ).astype(out_ref.dtype)

        @pl.when(jnp.logical_not(valid))
        def _():
            out_ref[0, nt] = jnp.zeros((J, S), out_ref.dtype)


def _sampler_project_collapse_kernel(valid_ref, corner_ref, cam_ref,
                                     start_ref, end_ref, occ_ref, hm_ref,
                                     oxy_ref, oxz_ref, oyz_ref,
                                     xm_scr, xz_scr, yz_scr, *, num_views,
                                     PH, NW, Wp, geom, K, tdims):
    """Person-sampler v2: sampling + tri-plane max-collapse in ONE kernel.

    Round-4's design-space analysis (NOTES_ROUND4.md) pinned the per-sample
    matmul cost to Mosaic's alignment floors; the remaining exit it named
    is producing the collapsed JLN planes without materializing the
    (P, T, J, S) cube in HBM. This kernel does exactly that: grid
    (P, Tx, Ty); each step projects+samples one full z-column of Tz tiles
    (as _sampler_project_kernel would), applies the per-voxel bbox-crop
    validity in-registers (same scalar math as ops/pallas/collapse.py),
    and reduces the column straight into the three plane partials —
    identical outputs to collapse_planes_pallas(pallas_tiled_sample_
    project(...)), with the 8x-larger tiled tensor never leaving VMEM.
    """
    J = hm_ref.shape[2]
    Hp = hm_ref.shape[3]
    Tx, Ty, Tz, tx, ty, tz = tdims
    S = tx * ty * tz
    p = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    # T is C-ordered over (Tx, Ty, Tz): the z-column (i, j) is the NT=Tz
    # consecutive tiles starting at (i*Ty + j)*Tz — exactly _step_coords'
    # tile group i*Ty + j
    step = _step_coords(corner_ref, cam_ref, p, i * Ty + j, NT=Tz, S=S,
                        num_views=num_views, geom=geom)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    fx = corner_ref[p, 0] + i * tx + lane // (ty * tz)
    fy = corner_ref[p, 1] + j * ty + (lane // tz) % ty
    vxy = ((fx >= start_ref[p, 0]) & (fx < end_ref[p, 0])
           & (fy >= start_ref[p, 1]) & (fy < end_ref[p, 1]))

    for k in range(Tz):
        valid = valid_ref[p, (i * Ty + j) * Tz + k] > 0
        coords = [(sx[k:k + 1, :] + PAD, sy[k:k + 1, :] + PAD)
                  for sx, sy in step]

        fz = corner_ref[p, 2] + k * tz + lane % tz
        vmask = (vxy & (fz >= start_ref[p, 2])
                 & (fz < end_ref[p, 2])).astype(jnp.float32)

        # tile skipping stays store-conditional (pl.when around a store is
        # pipeline-friendly; a lax.cond VALUE carry is what sank the
        # occupancy experiment — see _one_tile_from's note)
        @pl.when(valid)
        def _():
            t = _one_tile_from(coords, hm_ref, num_views, PH, Hp, Wp, NW,
                               J, S)
            xm_scr[k] = (t * vmask).astype(xm_scr.dtype)

        @pl.when(jnp.logical_not(valid))
        def _():
            xm_scr[k] = jnp.zeros((J, S), xm_scr.dtype)
    xm = xm_scr[...]                                   # (Tz, J, S)

    # ---- plane partials (identical scheme to ops/pallas/collapse.py) ----
    oxy_ref[0, 0, 0] = jnp.max(xm, axis=0)             # (J, S)

    @pl.when(j == 0)
    def _():
        xz_scr[...] = xm

    @pl.when(j > 0)
    def _():
        xz_scr[...] = jnp.maximum(xz_scr[...], xm)

    @pl.when(j == Ty - 1)
    def _():
        oxz_ref[0, 0] = xz_scr[...]

    @pl.when(i == 0)
    def _():
        yz_scr[j] = xm

    @pl.when(i > 0)
    def _():
        yz_scr[j] = jnp.maximum(yz_scr[j], xm)

    @pl.when((i == Tx - 1) & (j == Ty - 1))
    def _():
        oyz_ref[0] = yz_scr[...]


@functools.partial(
    jax.jit,
    static_argnames=("geom", "tdims", "PH", "people_per_item", "interpret",
                     "hm_dtype", "out_dtype"))
def pallas_tiled_sample_project_collapse(
        padded_hm: jax.Array, corner: jax.Array, cam: jax.Array,
        tile_valid: jax.Array, start: jax.Array, end: jax.Array,
        geom: tuple, tdims, PH: int = 32, people_per_item: int = 1,
        interpret: bool = False, hm_dtype=jnp.bfloat16,
        out_dtype=jnp.bfloat16):
    """Fused person-plane sampler: in-kernel projection + bilinear
    sampling + masked tri-plane collapse, one launch, no (P, T, J, S)
    HBM intermediate. Returns the collapse partials
    (oxy (P, Tx, Ty, J, S), oxz (P, Tx, Tz, J, S), oyz (P, Ty, Tz, J, S))
    — finish the within-tile axes with the same XLA epilogue as
    collapse_planes_pallas."""
    NB, V, J, Hp, Wp = padded_hm.shape
    P = corner.shape[0]
    Tx, Ty, Tz, tx, ty, tz = tdims
    S = tx * ty * tz
    assert P == NB * people_per_item
    PH = min(PH, Hp)
    K = people_per_item
    hm_win, NW, _ = _window_heatmaps(padded_hm)
    occ = jnp.zeros((NB, V, 1), jnp.int32)             # unused

    kernel = functools.partial(
        _sampler_project_collapse_kernel, num_views=V, PH=PH, NW=NW,
        Wp=Wp, geom=geom, K=K, tdims=tdims)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(P, Tx, Ty),
        in_specs=[
            pl.BlockSpec((1, V, J, Hp, hm_win.shape[-1]),
                         lambda p, i, j, *_: (p // K, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, J, S),
                         lambda p, i, j, *_: (p, i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tz, J, S),
                         lambda p, i, j, *_: (p, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ty, Tz, J, S),
                         lambda p, i, j, *_: (p, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((Tz, J, S), jnp.dtype(out_dtype)),
            pltpu.VMEM((Tz, J, S), jnp.dtype(out_dtype)),
            pltpu.VMEM((Ty, Tz, J, S), jnp.dtype(out_dtype)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((P, Tx, Ty, J, S), out_dtype),
            jax.ShapeDtypeStruct((P, Tx, Tz, J, S), out_dtype),
            jax.ShapeDtypeStruct((P, Ty, Tz, J, S), out_dtype),
        ],
        interpret=interpret,
    )(tile_valid.astype(jnp.int32), corner.astype(jnp.int32),
      cam.astype(jnp.float32), start.astype(jnp.int32),
      end.astype(jnp.int32), occ, hm_win.astype(hm_dtype))


def _window_heatmaps(padded_hm: jax.Array):
    """(..., Hp, Wp) padded heatmaps -> (..., Hp, NW*128) x-windows.

    Window k = source lanes [min(64k, Wp-128), +128), so any 64-aligned
    x-support of width <= ~64 px lies inside window floor(xmin/64), and
    the kernel reaches it with a 128-aligned dynamic lane slice. Built in
    XLA once per frame (a few MB of slicing); Wp <= 128 passes through
    untouched (NW=1)."""
    Wp = padded_hm.shape[-1]
    if Wp <= 128:
        return padded_hm, 1, Wp
    NW = (Wp - 128 + 63) // 64 + 1
    wins = [
        jax.lax.slice_in_dim(padded_hm, min(64 * k, Wp - 128),
                             min(64 * k, Wp - 128) + 128, axis=-1)
        for k in range(NW)
    ]
    return jnp.concatenate(wins, axis=-1), NW, Wp


@functools.partial(
    jax.jit,
    static_argnames=("PH", "tiles_per_step", "people_per_item", "interpret",
                     "hm_dtype", "out_dtype", "x_window", "occupancy"))
def pallas_tiled_sample(padded_hm: jax.Array, sx: jax.Array, sy: jax.Array,
                        tile_valid: jax.Array, PH: int = 32,
                        tiles_per_step: int = 8, people_per_item: int = 1,
                        interpret: bool = False,
                        hm_dtype=jnp.bfloat16,
                        out_dtype=jnp.float32,
                        x_window: bool = False,
                        occupancy: bool = False) -> jax.Array:
    """padded_hm: (NB, V, J, H+2*PAD, W+2*PAD) (zero border; stored bf16 in
    VMEM), one entry per frame; sx, sy: (P, T, V, S) heatmap-frame pixel
    coords of tiled samples, where row p samples frame
    p // people_per_item's heatmaps; tile_valid: (P, T) int32 (0 => emit
    zeros without sampling).
    Returns (P, T, J, S): per-tile view-mean bilinear samples in [0, 1].

    PH is the y-band height; a tile whose projected y-extent exceeds
    PH - 9 rows loses out-of-band rows. Two sample classes can trigger
    this: (a) voxels pathologically close to a camera's image plane;
    (b) out-of-frustum voxels that the reference's ori-pixel clamp pins to
    ~-0.12 heatmap rows, which graze image row 0 with ~0.88 weight while
    sitting arbitrarily far below the tile's in-view rows. Both produce
    geometric artifacts, not signal; measured deviation vs the exact
    gather path is ~0.1% of whole-space voxels / 0.008% of person-cube
    voxels (realistic rigs), self-consistent between training and eval
    since both run this kernel. The exact path (fvp_tpu/ops/sampling.py)
    remains available via cfg.sampling_backend='exact'."""
    NB, V, J, Hp, Wp = padded_hm.shape
    P, T, _, S = sx.shape
    assert P == NB * people_per_item, (P, NB, people_per_item)
    PH = min(PH, Hp)
    NT = tiles_per_step
    while T % NT:
        NT //= 2
    K = people_per_item
    hm_win, NW, _ = (_window_heatmaps(padded_hm) if x_window
                     else (padded_hm, 1, Wp))
    if occupancy:
        from fvp_tpu.ops.fast_sampling import occupancy_rows
        occ = occupancy_rows(padded_hm)
    else:
        occ = jnp.zeros((NB, V, 1), jnp.int32)   # unused dummy (static off)

    kernel = functools.partial(_sampler_kernel, num_views=V, PH=PH,
                               NW=NW, Wp=Wp, K=K, use_occ=occupancy)
    grid = (P, T // NT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, NT, V, S), lambda p, t, *_: (p, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NT, V, S), lambda p, t, *_: (p, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, J, Hp, hm_win.shape[-1]),
                         lambda p, t, *_: (p // K, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NT, J, S), lambda p, t, *_: (p, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, T, J, S), out_dtype),
        interpret=interpret,
    )(tile_valid.astype(jnp.int32), occ, sx, sy, hm_win.astype(hm_dtype))


@functools.partial(
    jax.jit,
    static_argnames=("num_tiles", "samples_per_tile", "geom", "PH",
                     "tiles_per_step", "people_per_item", "interpret",
                     "hm_dtype", "out_dtype", "occupancy"))
def pallas_tiled_sample_project(padded_hm: jax.Array, corner: jax.Array,
                                cam: jax.Array, tile_valid: jax.Array,
                                num_tiles: int, samples_per_tile: int,
                                geom: tuple, PH: int = 32,
                                tiles_per_step: int = 8,
                                people_per_item: int = 1,
                                interpret: bool = False,
                                hm_dtype=jnp.bfloat16,
                                out_dtype=jnp.float32,
                                occupancy: bool = False) -> jax.Array:
    """Per-person sampler with IN-KERNEL projection: same output contract
    as pallas_tiled_sample, but instead of (P, T, V, S) precomputed pixel
    coordinates it takes per-person fine-grid cube corners (P, 3) int32 and
    packed per-view camera parameters (V, 27) f32 (see _step_coords), and
    projects each voxel tile on the VPU right before sampling it. Removes
    the coordinate tensors' HBM round-trip (~105 MB/frame at flagship
    shapes) and their XLA compute from the hot path.

    geom: static tile/space geometry tuple (Tx, Ty, Tz, tx, ty, tz,
    pitch x/y/z, origin x/y/z, ori-pixel clamp bound, heatmap w-1, h-1).
    Returns (P, T, J, S) view-mean bilinear samples in [0, 1]."""
    NB, V, J, Hp, Wp = padded_hm.shape
    P = corner.shape[0]
    T, S = num_tiles, samples_per_tile
    assert P == NB * people_per_item, (P, NB, people_per_item)
    PH = min(PH, Hp)
    NT = tiles_per_step
    while T % NT:
        NT //= 2
    K = people_per_item
    hm_win, NW, _ = _window_heatmaps(padded_hm)
    if occupancy:
        from fvp_tpu.ops.fast_sampling import occupancy_rows
        occ = occupancy_rows(padded_hm)
    else:
        occ = jnp.zeros((NB, V, 1), jnp.int32)   # unused dummy (static off)

    kernel = functools.partial(_sampler_project_kernel, num_views=V, PH=PH,
                               NW=NW, Wp=Wp, geom=geom, K=K,
                               use_occ=occupancy)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(P, T // NT),
        in_specs=[
            pl.BlockSpec((1, V, J, Hp, hm_win.shape[-1]),
                         lambda p, t, *_: (p // K, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NT, J, S), lambda p, t, *_: (p, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, T, J, S), out_dtype),
        interpret=interpret,
    )(tile_valid.astype(jnp.int32), corner.astype(jnp.int32),
      cam.astype(jnp.float32), occ, hm_win.astype(hm_dtype))
