"""Pallas TPU kernels: the backbone's 3-stage transposed-conv head as dense
per-parity MXU matmuls.

The reference backbone upsamples layer4 with three ConvTranspose(4x4, s2,
p1) + BN + ReLU stages (lib/models/resnet.py:160-185). Both standard XLA
lowerings are far off roofline on v5e (measured round 2: the whole head
~4.8 ms of a 7 ms backbone): input-dilation spends 4x4xCin MACs per output
where only 2x2xCin taps are nonzero, and the 2x2-conv + depth-to-space
rewrite (models/resnet.py::_FusedDeconv) pays a full-tensor interleave
relayout between every stage. FLOP math says ~1 ms is enough.

This kernel computes each stage as 16 dense matmuls per row-block — one per
(tap u, tap v, parity r, parity s) —

    out[2i+r, 2j+s] = sum_{u,v} x[i - 1 + u + r?, ...]   (see below)
    o_rs = sum_{u,v} X_uv @ K4[u, v, r, s]        X_uv: (rows, Cin) slice
                                                  K4:   (Cin, F)

with the verified _FusedDeconv weight decomposition

    K4[u, v, r, s][ci, f] = k[2u+1-r, 2v+1-s, ci, f]

on the padded "out_full" grid i' in [0, H], where X_uv = xpad[i'+u, j'+v]
(xpad = x zero-padded by 1). The canonical output is the interleave
y[2i'+r, 2j'+s] = o[i', j', r, s] sliced to [1 : 2H+1) — exactly
_FusedDeconv's math, which is parity-pinned against nn.ConvTranspose in
tests/test_resnet.py.

Layout strategy (Mosaic constraints):
  - activations ride VMEM as (rows, cols, C) with C on lanes; tap shifts
    are static value-slices on sublane dims (legal, cheap);
  - (RB, W32, C) -> (RB*W32, C) row merges keep W32 a multiple of 8;
  - parities are separate (rows, F) matmuls — nothing ever lane-reshapes;
  - per-parity outputs are written to separate blocks; the interleave
    (pure reshape/transpose of small bf16 tensors) happens in XLA outside.
  - BN is folded to a per-F affine (running stats; inference only) and
    applied to the f32 accumulator before the bf16 cast.

Stage 1 (Cin=2048) streams Cin in chunks (the packed weights are 16.8 MB
bf16 — VMEM holds one chunk x one parity at a time); stages 2/3 keep all
weights resident and stream row-blocks of the output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(n: int) -> int:
    return (n + 7) // 8 * 8


def pack_k4(kernel: jax.Array) -> jax.Array:
    """(4, 4, Cin, F) ConvTranspose kernel -> (2u, 2v, 2r, 2s, Cin, F)
    per-(tap, parity) matmul weights: K4[u,v,r,s] = k[2u+1-r, 2v+1-s]."""
    idx = jnp.asarray([1, 0, 3, 2])
    kr = kernel[idx][:, idx]                  # kr[2u+r, 2v+s] = k[...]
    k4 = kr.reshape(2, 2, 2, 2, *kernel.shape[2:])   # (u, r, v, s, C, F)
    return k4.transpose(0, 2, 1, 3, 4, 5)            # (u, v, r, s, C, F)


def bn_affine(scale, bias, mean, var, eps: float = 1e-5):
    """Fold BatchNorm running stats into a per-channel (a, b) affine."""
    a = scale / jnp.sqrt(var + eps)
    return jnp.stack([a, bias - mean * a]).astype(jnp.float32)  # (2, F)


def _stage_glue(out6, H: int, W: int, NB: int, YB: int):
    """(V, NB, 2r, 2s, RB, W32, F) per-parity blocks -> (V, 2H, 2W, F):
    the canonical interleave + SAME-crop, done in XLA on bf16 tensors."""
    V, _, _, _, RB, W32, F = out6.shape
    o = out6.transpose(0, 1, 4, 2, 5, 3, 6)       # (V, NB, RB, r, W32, s, F)
    o = o.reshape(V, NB, 2 * RB, 2 * W32, F)
    o = o[:, :, 1:YB + 1]                         # per-block valid y rows
    o = o.reshape(V, NB * YB, 2 * W32, F)
    return o[:, :, 1:2 * W + 1]


def _taps(xv, u: int, v: int, RB: int, W32: int):
    """Static tap slice of the loaded (RL, WCP, C) window."""
    return xv[u:u + RB, v:v + W32, :]


def _stage_rows_kernel(xp_ref, k4_ref, aff_ref, out_ref, *,
                       RB: int, W32: int, YB: int):
    """Row-blocked stage (resident x + weights): grid (V, NB, 4 parities)."""
    b = pl.program_id(1)
    p = pl.program_id(2)
    r, s = p // 2, p % 2
    RL = YB // 2 + 2
    C = xp_ref.shape[-1]
    F = out_ref.shape[-1]

    xv = xp_ref[0, pl.ds(b * (YB // 2), RL), :, :]     # (RL, WCP, C)
    acc = jnp.zeros((RB * W32, F), jnp.float32)
    for u in range(2):
        for v in range(2):
            x_uv = _taps(xv, u, v, RB, W32).reshape(RB * W32, C)
            acc = acc + jax.lax.dot_general(
                x_uv, k4_ref[u, v, r, s],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o = jnp.maximum(acc * aff_ref[0] + aff_ref[1], 0.0)
    out_ref[0, 0, 0] = o.reshape(RB, W32, F).astype(out_ref.dtype)


def _stage1_kernel(xp_ref, k4_ref, aff_ref, out_ref, acc_ref, *,
                   RB: int, W32: int, NC: int):
    """Cin-chunked stage (one row-block; weights streamed): grid
    (V, 4 parities, NC chunks). acc persists across the chunk axis."""
    c = pl.program_id(2)
    Cc = xp_ref.shape[-1]
    F = out_ref.shape[-1]

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xv = xp_ref[0]                                     # (RL, WCP, Cc)
    acc = acc_ref[...]
    for u in range(2):
        for v in range(2):
            x_uv = _taps(xv, u, v, RB, W32).reshape(RB * W32, Cc)
            acc = acc + jax.lax.dot_general(
                x_uv, k4_ref[0, 0, 0, u, v],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc_ref[...] = acc

    @pl.when(c == NC - 1)
    def _():
        o = jnp.maximum(acc * aff_ref[0] + aff_ref[1], 0.0)
        out_ref[0, 0] = o.reshape(RB, W32, F).astype(out_ref.dtype)


def _pad_input(x: jax.Array, W32: int) -> jax.Array:
    """(V, H, W, C) -> zero-padded (V, H+2, W32+2, C) bf16: one border row/
    col for the tap shifts, plus zero cols up to the 8-aligned matmul
    width (their outputs are cropped by the glue)."""
    V, H, W, C = x.shape
    return jnp.pad(x, ((0, 0), (1, 1), (1, W32 + 1 - W), (0, 0))
                   ).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("NB", "interpret"))
def deconv_stage_rows(x: jax.Array, k4: jax.Array, aff: jax.Array,
                      NB: int = 1, interpret: bool = False) -> jax.Array:
    """One ConvTranspose(4x4, s2, SAME) + BN + ReLU stage, row-blocked.
    x: (V, H, W, C); k4: (2,2,2,2,C,F) packed weights; aff: (2, F).
    Returns (V, 2H, 2W, F) bf16."""
    V, H, W, C = x.shape
    F = k4.shape[-1]
    assert (2 * H) % NB == 0 and (2 * H // NB) % 2 == 0
    YB = 2 * H // NB       # rows are a leading (non-tiled) dim: any start
    RB = YB // 2 + 1
    W32 = _round8(W + 1)
    xp = _pad_input(x, W32)

    kernel = functools.partial(_stage_rows_kernel, RB=RB, W32=W32, YB=YB)
    out6 = pl.pallas_call(
        kernel,
        grid=(V, NB, 4),
        in_specs=[
            pl.BlockSpec((1, H + 2, W32 + 2, C),
                         lambda v, b, p: (v, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, 2, 2, C, F),
                         lambda v, b, p: (0, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F), lambda v, b, p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, RB, W32, F),
                               lambda v, b, p: (v, b, p, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, NB, 4, RB, W32, F),
                                       jnp.bfloat16),
        interpret=interpret,
    )(xp, k4.astype(jnp.bfloat16), aff)
    out6 = out6.reshape(V, NB, 2, 2, RB, W32, F)
    return _stage_glue(out6, H, W, NB, YB)


@functools.partial(jax.jit, static_argnames=("NC", "interpret"))
def deconv_stage_chunked(x: jax.Array, k4: jax.Array, aff: jax.Array,
                         NC: int = 8, interpret: bool = False) -> jax.Array:
    """Cin-streamed variant for the wide first stage (Cin=2048: the packed
    weights exceed VMEM). x: (V, H, W, C); k4: (2,2,2,2,C,F); returns
    (V, 2H, 2W, F) bf16."""
    V, H, W, C = x.shape
    F = k4.shape[-1]
    assert C % NC == 0
    Cc = C // NC
    RB = H + 1
    W32 = _round8(W + 1)
    xp = _pad_input(x, W32)
    # (NC, 2r, 2s, 2u, 2v, Cc, F): chunk axis leads so one block = one chunk
    k4c = (k4.transpose(2, 3, 0, 1, 4, 5)          # (r, s, u, v, C, F)
           .reshape(2, 2, 2, 2, NC, Cc, F)
           .transpose(4, 0, 1, 2, 3, 5, 6))

    kernel = functools.partial(_stage1_kernel, RB=RB, W32=W32, NC=NC)
    out6 = pl.pallas_call(
        kernel,
        grid=(V, 4, NC),
        in_specs=[
            pl.BlockSpec((1, H + 2, W32 + 2, Cc),
                         lambda v, p, c: (v, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 2, 2, Cc, F),
                         lambda v, p, c: (c, p // 2, p % 2, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F), lambda v, p, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, RB, W32, F),
                               lambda v, p, c: (v, p, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, 4, RB, W32, F), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((RB * W32, F), jnp.float32)],
        interpret=interpret,
    )(xp, k4c.astype(jnp.bfloat16), aff)
    out6 = out6.reshape(V, 1, 2, 2, RB, W32, F)
    return _stage_glue(out6, H, W, 1, 2 * H)


def pack_deconv_head(kernels) -> dict:
    """Pre-packed per-(tap, parity) deconv weights (pack_k4 of each stage)
    — ~25 MB of transposes hoisted to model load instead of re-run inside
    every jitted forward (engine/packing.py)."""
    return {"k4": tuple(pack_k4(k) for k in kernels)}


def pallas_deconv_head(x: jax.Array, kernels, affines,
                       interpret: bool = False,
                       packed: dict | None = None) -> jax.Array:
    """The full 3-stage deconv head. x: (V, H, W, 2048) layer4 activations;
    kernels: 3 canonical (4, 4, Cin, 256) ConvTranspose params; affines:
    3 folded (2, 256) BN affines. Returns (V, 8H, 8W, 256) bf16.

    Inference-only (BN running stats); the XLA ConvTranspose path stays the
    module default and the training path. `packed`: optional pre-packed
    weights (pack_deconv_head)."""
    V, H, W, C = x.shape
    k4 = packed["k4"] if packed is not None \
        else tuple(pack_k4(k) for k in kernels)
    x = deconv_stage_chunked(x, k4[0], affines[0], interpret=interpret)
    x = deconv_stage_rows(x, k4[1], affines[1], NB=1, interpret=interpret)
    x = deconv_stage_rows(x, k4[2], affines[2], NB=8, interpret=interpret)
    return x
