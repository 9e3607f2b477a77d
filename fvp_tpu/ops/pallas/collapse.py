"""Pallas TPU kernel: fused tri-plane collapse of tiled person-cube samples.

The JLN collapses each person's (nx, ny, nz, J) feature cube into three
orthogonal planes by max (reference joint_localization_net.py:120-131).
Done in XLA on the sampler's tiled output this costs ~3.6 ms/frame at
flagship shapes: a 79 MB relayout copy feeding three full-tensor
reductions, plus a separate per-voxel validity-mask multiply (measured
in the round-2 profiler trace). This kernel reads the tiled tensor ONCE,
applies the bbox-crop validity in-kernel from prefetched scalars, and
reduces over the TILE-GRID axes (the bulk of the data) with plain
elementwise maxes — Mosaic has no lane-reshape support, so the small
within-tile axes (tx, ty, tz lanes) are finished by XLA on the 8x
smaller partials.

  grid = (P, Tx, Ty), Ty fastest; each step loads one (i, j) column of
  Tz x (J, S) tile values (S = tx*ty*tz lanes, C-order).
    xy partial: max over the Tz rows        -> block (J, S) per (p, i, j)
    xz partial: max over j (VMEM scratch)   -> block (Tz, J, S) per (p, i)
    yz partial: max over i (per-j scratch slots), flushed once per person

Validity: start/end/corner voxel bounds per person ride scalar prefetch;
the (Tz, S) mask is rebuilt from iota decomposition of the lane index —
no (P, T, J, S)-sized mask tensor ever exists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _collapse_kernel(start_ref, end_ref, corner_ref, in_ref,
                     oxy_ref, oxz_ref, oyz_ref,
                     xz_scr, yz_scr, *, tdims):
    Tx, Ty, Tz, tx, ty, tz = tdims
    p = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    S = tx * ty * tz

    x = in_ref[0]                                      # (Tz, J, S)

    # ---- per-voxel validity from scalars (bbox crop, person aliveness) --
    lane = jax.lax.broadcasted_iota(jnp.int32, (Tz, S), 1)
    krow = jax.lax.broadcasted_iota(jnp.int32, (Tz, S), 0)
    fx = corner_ref[p, 0] + i * tx + lane // (ty * tz)
    fy = corner_ref[p, 1] + j * ty + (lane // tz) % ty
    fz = corner_ref[p, 2] + krow * tz + lane % tz
    valid = ((fx >= start_ref[p, 0]) & (fx < end_ref[p, 0])
             & (fy >= start_ref[p, 1]) & (fy < end_ref[p, 1])
             & (fz >= start_ref[p, 2]) & (fz < end_ref[p, 2]))
    xm = x * valid[:, None, :].astype(x.dtype)         # (Tz, J, S)

    # ---- xy partial: collapse the Tz rows (leading-dim reduce) ----------
    oxy_ref[0, 0, 0] = jnp.max(xm, axis=0)             # (J, S)

    # ---- xz partial: accumulate max over j in scratch -------------------
    @pl.when(j == 0)
    def _():
        xz_scr[...] = xm

    @pl.when(j > 0)
    def _():
        xz_scr[...] = jnp.maximum(xz_scr[...], xm)

    @pl.when(j == Ty - 1)
    def _():
        oxz_ref[0, 0] = xz_scr[...]

    # ---- yz partial: per-j scratch slot, accumulated over i -------------
    @pl.when(i == 0)
    def _():
        yz_scr[j] = xm

    @pl.when(i > 0)
    def _():
        yz_scr[j] = jnp.maximum(yz_scr[j], xm)

    @pl.when((i == Tx - 1) & (j == Ty - 1))
    def _():
        oyz_ref[0] = yz_scr[...]


@functools.partial(jax.jit,
                   static_argnames=("tdims", "num_joints", "interpret"))
def collapse_planes_pallas(tiled: jax.Array, start: jax.Array,
                           end: jax.Array, corner: jax.Array,
                           tdims, num_joints: int,
                           interpret: bool = False):
    """tiled: (P, T, J, S) person-cube samples in sampler tile order
    (T C-ordered over (Tx, Ty, Tz); S C-ordered over (tx, ty, tz));
    start/end/corner: (P, 3) int32 valid-voxel bounds in fine-grid coords
    (end <= start on any axis masks the whole person).

    Returns (xy (P, nx, ny, J), xz (P, nx, nz, J), yz (P, ny, nz, J))
    float32 — bitwise the masked max-collapse of the cube."""
    Tx, Ty, Tz, tx, ty, tz = tdims
    P, T, J, S = tiled.shape
    assert T == Tx * Ty * Tz and S == tx * ty * tz and J == num_joints
    dt = tiled.dtype

    kernel = functools.partial(_collapse_kernel, tdims=tdims)
    grid = (P, Tx, Ty)
    oxy, oxz, oyz = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Tz, J, S),
                             lambda p, i, j, *_: (p, i * Ty + j, 0, 0),
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
                pltpu.VMEM((Tz, J, S), dt),
                pltpu.VMEM((Ty, Tz, J, S), dt),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((P, Tx, Ty, J, S), dt),
            jax.ShapeDtypeStruct((P, Tx, Tz, J, S), dt),
            jax.ShapeDtypeStruct((P, Ty, Tz, J, S), dt),
        ],
        interpret=interpret,
    )(start.astype(jnp.int32), end.astype(jnp.int32),
      corner.astype(jnp.int32), tiled)

    return finish_plane_partials(oxy, oxz, oyz, tdims)


def finish_plane_partials(oxy, oxz, oyz, tdims):
    """XLA epilogue shared with the fused v2 sampler
    (ops/pallas/sampler.py::pallas_tiled_sample_project_collapse):
    finish the small within-tile axes on the 8x-reduced partials."""
    Tx, Ty, Tz, tx, ty, tz = tdims
    P, _, _, J, _ = oxy.shape
    f32 = jnp.float32
    xy = jnp.max(oxy.astype(f32).reshape(P, Tx, Ty, J, tx, ty, tz),
                 axis=6)
    xy = xy.transpose(0, 1, 4, 2, 5, 3).reshape(P, Tx * tx, Ty * ty, J)
    xz = jnp.max(oxz.astype(f32).reshape(P, Tx, Tz, J, tx, ty, tz),
                 axis=5)
    xz = xz.transpose(0, 1, 4, 2, 5, 3).reshape(P, Tx * tx, Tz * tz, J)
    yz = jnp.max(oyz.astype(f32).reshape(P, Ty, Tz, J, tx, ty, tz),
                 axis=4)
    yz = yz.transpose(0, 1, 4, 2, 5, 3).reshape(P, Ty * ty, Tz * tz, J)
    return xy, xz, yz
