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


def _one_tile(sx_ref, sy_ref, hm_ref, nt, num_views, PH, Hp, Wp, J, S):
    def one_view(v, acc):
        # v, nt are Python ints (static unroll): static leading indices
        sx = sx_ref[0, nt, v:v + 1, :] + PAD       # (1, S), padded frame
        sy = sy_ref[0, nt, v:v + 1, :] + PAD

        oy = jnp.floor(jnp.min(sy)) - 1.0
        oy = jnp.clip(oy, 0.0, Hp - PH)
        # align the band origin down to the sublane tile (8 rows); PH's
        # margin guarantees the hat supports stay inside the band
        oyi = (oy.astype(jnp.int32) // 8) * 8
        ly = sy - oyi.astype(jnp.float32)

        iw = jax.lax.broadcasted_iota(
            jnp.int32, (Wp, S), 0).astype(jnp.float32)
        iy = jax.lax.broadcasted_iota(
            jnp.int32, (PH, S), 0).astype(jnp.float32)
        wxT = jnp.maximum(0.0, 1.0 - jnp.abs(
            jnp.broadcast_to(sx, (Wp, S)) - iw))   # (Wp, S)
        wyT = jnp.maximum(0.0, 1.0 - jnp.abs(
            jnp.broadcast_to(ly, (PH, S)) - iy))   # (PH, S)

        band = hm_ref[0, v, :, pl.ds(oyi, PH), :]  # (J, PH, Wp)

        # with bf16 heatmaps (default): bf16 x bf16 -> f32, matching the
        # MXU's default-precision path for f32 operands at half the VMEM
        # footprint for the resident heatmaps
        t1 = jax.lax.dot_general(
            band.reshape(J * PH, Wp), wxT.astype(band.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (J*PH, S)
        return acc + jnp.sum(
            t1.reshape(J, PH, S) * wyT[None, :, :], axis=1)    # (J, S)

    acc = jnp.zeros((J, S), jnp.float32)
    for v in range(num_views):
        acc = one_view(v, acc)
    return jnp.clip(acc / num_views, 0.0, 1.0)


def _sampler_kernel(valid_ref, sx_ref, sy_ref, hm_ref, out_ref, *,
                    num_views, PH):
    """Grid step = NT voxel tiles (batched to amortize per-step overhead).
    valid_ref: scalar-prefetched (P, T) int32 tile mask;
    sx_ref/sy_ref blocks (1, NT, V, S); hm_ref block (1, V, J, Hp, Wp)
    [the owning frame's heatmaps, VMEM-resident]; out_ref (1, NT, J, S)."""
    J = hm_ref.shape[2]
    Hp, Wp = hm_ref.shape[3], hm_ref.shape[4]
    NT = sx_ref.shape[1]
    S = sx_ref.shape[3]
    p = pl.program_id(0)
    tg = pl.program_id(1)

    for nt in range(NT):
        valid = valid_ref[p, tg * NT + nt] > 0

        @pl.when(valid)
        def _():
            out_ref[0, nt] = _one_tile(sx_ref, sy_ref, hm_ref, nt,
                                       num_views, PH, Hp, Wp, J, S
                                       ).astype(out_ref.dtype)

        @pl.when(jnp.logical_not(valid))
        def _():
            out_ref[0, nt] = jnp.zeros((J, S), out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("PH", "tiles_per_step", "people_per_item", "interpret",
                     "hm_dtype", "out_dtype"))
def pallas_tiled_sample(padded_hm: jax.Array, sx: jax.Array, sy: jax.Array,
                        tile_valid: jax.Array, PH: int = 32,
                        tiles_per_step: int = 8, people_per_item: int = 1,
                        interpret: bool = False,
                        hm_dtype=jnp.bfloat16,
                        out_dtype=jnp.float32) -> jax.Array:
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

    kernel = functools.partial(_sampler_kernel, num_views=V, PH=PH)
    grid = (P, T // NT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, NT, V, S), lambda p, t, *_: (p, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NT, V, S), lambda p, t, *_: (p, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, J, Hp, Wp),
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
    )(tile_valid.astype(jnp.int32), sx, sy, padded_hm.astype(hm_dtype))
