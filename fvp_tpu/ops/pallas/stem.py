"""Pallas TPU kernel: the backbone stem (7x7/s2 conv + BN + ReLU +
3x3/s2 maxpool) over a HOST-side space-to-depth input.

The reference stem (lib/models/resnet.py:134-139 -> conv1/bn1/maxpool) is
a 3-channel stride-2 conv — the worst possible MXU shape (contraction
minor = 3 of 128 lanes). Round-2/3 measurements: XLA native 2.4 ms, the
device-side space-to-depth rewrite 4.5 ms (relayout-bound), XLA on a
host-s2d input 2.2 ms — all ~15x off the ~0.15 ms FLOP floor.

Here the DATA PIPELINE ships frames space-to-depth(2): (H/2, W/2, 12)
(a free numpy reshape on the host), and this kernel computes the
equivalent stride-1 4x4x12 conv with padding (2, 1) — the exact
zero-fill rewrite validated in tools/microbench_tail.py — as ONE im2col
matmul per row block: 16 lane-concatenated taps -> (rows, 192) @
(192, 64), with the BN affine, ReLU and the 3x3/s2 maxpool fused before
anything returns to HBM. Output: (B, H/4, W/4, 64), bit-matching
conv+BN+relu+maxpool up to bf16 rounding.

MEASURED SLOWER than the XLA stem on v5e (3.04 vs 2.44 ms for 5 views,
2026-08-19): lane-concatenating 12-lane tap pieces is sub-tile
granularity, which Mosaic lowers to slow per-element shifts — the
im2col build dwarfs the matmul. Kept (correct, parity-tested, feed
plumbing in place) for re-evaluation on hardware with cheaper lane
shuffles; stem='xla' stays the default everywhere.

Pool windows are {2p-1, 2p, 2p+1} (SAME, -inf padded); the row at
global conv index -1 is masked to -inf in-kernel (it would otherwise
carry the BN bias from the zero-filled x rows). Inference-only (folded
BN), like the other Pallas lowerings; training keeps the XLA stem.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38


def s2d_host(images: np.ndarray, channels: int = 16) -> np.ndarray:
    """(..., H, W, 3) -> (..., H/2, W/2, channels) numpy space-to-depth(2):
    what the data pipeline ships when the stem runs the Pallas path.
    channels=16 (default) appends 4 zero channels so every im2col tap
    piece is 16-lane — a power-of-two lane shift for Mosaic instead of
    the 12-lane sub-tile shifts that made the 12-channel kernel lose its
    round-3 A/B. Same-run v5e A/B (microbench_r4, 2026-08-20): XLA stem
    4.02 ms | pallas 12ch 3.37 | pallas 16ch 2.97 — the 16-lane format
    flips the stem to a win and makes host_s2d the serving default."""
    *lead, H, W, C = images.shape
    x = images.reshape(*lead, H // 2, 2, W // 2, 2, C)
    x = np.moveaxis(x, -4, -3)                # (..., H/2, W/2, dy, dx, C)
    x = np.ascontiguousarray(x.reshape(*lead, H // 2, W // 2, 4 * C))
    if channels > 4 * C:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, channels - 4 * C)]
        x = np.pad(x, pad)
    return x


def s2d_device(images: jax.Array) -> jax.Array:
    """jnp twin of s2d_host (for callers whose frames are already on
    device; the relayout cost then lands on the chip)."""
    *lead, H, W, C = images.shape
    x = images.reshape(*lead, H // 2, 2, W // 2, 2, C)
    x = jnp.moveaxis(x, -4, -3)
    return x.reshape(*lead, H // 2, W // 2, 4 * C)


def pack_stem_kernel(kernel: jax.Array, channels: int = 12) -> jax.Array:
    """Canonical (7, 7, 3, F) conv1 kernel -> (4*4*channels, F) s2d matmul
    weights (pad to 8x8 at the front, s2d both axes; zero taps only).
    channels=16 interleaves 4 zero rows per tap piece to match the
    16-lane-padded host format."""
    F = kernel.shape[-1]
    kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k2 = kp.reshape(4, 2, 4, 2, 3, F).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(16, 12, F)
    if channels > 12:
        k2 = jnp.pad(k2, ((0, 0), (0, channels - 12), (0, 0)))
    return k2.reshape(16 * channels, F)


def _stem_kernel(x_ref, w_ref, aff_ref, out_ref, *, Rp, Wc, F, NB):
    """Grid (B, NB). x_ref: (1, H2+6, Wc+3, 12) padded s2d view (VMEM
    resident across row blocks); out_ref: (1, 1, Rp, Wc//2, F)."""
    b = pl.program_id(1)
    RC = 2 * Rp + 2
    RX = 2 * Rp + 6
    # conv row l of this block taps x rows (2*Rp*b + l + u) in the padded
    # frame (leading dim: any dynamic start is legal)
    C = x_ref.shape[-1]
    xv = x_ref[0, pl.ds(b * 2 * Rp, RX)]                # (RX, Wc+3, C)

    taps = [xv[u:u + RC, v:v + Wc, :].reshape(RC * Wc, C)
            for u in range(4) for v in range(4)]
    x16 = jnp.concatenate(taps, axis=1)                 # (RC*Wc, 16*C)
    h = jax.lax.dot_general(
        x16, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (RC*Wc, F)
    h = jnp.maximum(h * aff_ref[0] + aff_ref[1], 0.0)
    c = h.reshape(RC, Wc, F)

    # conv row l=0 of block 0 is global row -1: -inf for the pool
    row = jax.lax.broadcasted_iota(jnp.int32, (RC, Wc, F), 0)
    c = jnp.where((b == 0) & (row == 0), _NEG, c)

    # rows pool: p uses local conv rows {2p, 2p+1, 2p+2}
    m1 = jnp.max(c[0:2 * Rp].reshape(Rp, 2, Wc, F), axis=1)
    m2 = c[2:2 * Rp + 2].reshape(Rp, 2, Wc, F)[:, 0]
    r = jnp.maximum(m1, m2)                             # (Rp, Wc, F)

    # cols pool: q uses cols {2q-1, 2q, 2q+1}; -inf pad at both ends
    t = r.swapaxes(0, 1)                                # (Wc, Rp, F)
    pad = jnp.full((1, Rp, F), _NEG, t.dtype)
    tp = jnp.concatenate([pad, t, pad], axis=0)         # (Wc+2, Rp, F)
    m1 = jnp.max(tp[0:Wc].reshape(Wc // 2, 2, Rp, F), axis=1)
    m2 = tp[2:Wc + 2].reshape(Wc // 2, 2, Rp, F)[:, 0]
    q = jnp.maximum(m1, m2).swapaxes(0, 1)              # (Rp, Wc/2, F)
    out_ref[0, 0] = q.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("NB", "interpret"))
def pallas_stem(x_s2d: jax.Array, kernel: jax.Array, affine: jax.Array,
                NB: int = 16, interpret: bool = False) -> jax.Array:
    """x_s2d: (B, H2, W2, 12) space-to-depth frames (H2 = H/2);
    kernel: canonical (7, 7, 3, F) conv1 parameter; affine: folded (2, F)
    bn1. Returns (B, H2/2, W2/2, F) bf16 == maxpool(relu(bn(conv1(x))))."""
    B, H2, Wc, C = x_s2d.shape
    F = kernel.shape[-1]
    assert C in (12, 16) and H2 % (2 * NB) == 0 and Wc % 2 == 0
    Rp = H2 // 2 // NB

    # conv taps (padding (2,1) on both axes of the s2d frame): row g taps
    # x[g-2+u], col j taps x[j-2+v]. Block b covers conv rows
    # [2*Rp*b - 1, 2*Rp*(b+1) + 1); with 3 rows of top pad the block's
    # x-slice start is simply 2*Rp*b and local indices are l+u / j+v.
    xp = jnp.pad(x_s2d, ((0, 0), (3, 3), (2, 1), (0, 0))
                 ).astype(jnp.bfloat16)
    w = pack_stem_kernel(kernel, channels=C).astype(jnp.bfloat16)

    kern = functools.partial(_stem_kernel, Rp=Rp, Wc=Wc, F=F, NB=NB)
    return pl.pallas_call(
        kern,
        grid=(B, NB),
        in_specs=[
            pl.BlockSpec((1, H2 + 6, Wc + 3, C),
                         lambda v, b: (v, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda v, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F), lambda v, b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Rp, Wc // 2, F),
                               lambda v, b: (v, b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NB, Rp, Wc // 2, F),
                                       jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w, affine).reshape(B, H2 // 2, Wc // 2, F)
