"""Pallas TPU kernel: WeightNet's conv+BN+pool+mean front end, fused.

The reference WeightNet (lib/models/weight_net.py:69-80) runs, per plane
heatmap channel: Conv3x3(1->32) + BN + maxpool(2) + ReLU + global average
pool, then a tiny MLP. As separate XLA ops at serving shapes this writes a
(3BK*J, 64, 64, 32) activation tensor through HBM twice (~measured 1.3 ms
of a 13 ms frame for ~1 GFLOP of work). This kernel keeps everything in
VMEM and emits only the (N, J, 32) pooled features; the MLP (a few-KFLOP
matmul) stays in XLA.

MXU formulation: a Cin=1 conv shared across J channels is a block-diagonal
grouped conv — im2col the 9 taps of all J channels into (A*B, 9*J) and
multiply one (9*J, J*32) matrix whose (t*J+j, j'*32+c) entry is
w[t, c] * [j == j']. 15x of the matmul is structural zeros, but the MXU is
>50x denser than the VPU path this replaces, so it wins outright.

Order note: the reference applies maxpool BEFORE ReLU; max and ReLU are
both monotone so pool(relu(x)) == relu(pool(x)) — the kernel computes
relu first, which lets the pool and the mean run on one tensor.

Inference-only (BN folded to a per-channel affine from running stats); the
XLA module path remains the training path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _weightnet_kernel(xp_ref, w_ref, aff_ref, out_ref, *, A, B, J, C):
    """Grid (N,). xp_ref: (1, A+2, B+2, J) zero-padded plane heatmaps;
    w_ref: (9*J, J*C) block-diagonal conv matrix; aff_ref: (2, J*C)
    folded conv-bias+BN affine tiled per (j, c); out_ref: (1, 8, J*C)
    (row 0 = spatial mean of relu'd pooled features; rows 1.. padding)."""
    xv = xp_ref[0]                                     # (A+2, B+2, J)
    taps = [xv[dy:dy + A, dx:dx + B, :].reshape(A * B, J)
            for dy in range(3) for dx in range(3)]
    x9 = jnp.concatenate(taps, axis=1)                 # (A*B, 9J)
    h = jax.lax.dot_general(
        x9.astype(w_ref.dtype), w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (A*B, J*C)
    h = jnp.maximum(h * aff_ref[0] + aff_ref[1], 0.0)  # affine + relu
    # 2x2 maxpool in bf16 (relayouts are VMEM-bandwidth-bound — halving
    # bytes halves the pool cost; the XLA module path pools in bf16 too):
    # leading-dim pair-splits with a transpose for the col axis (a bf16
    # sublane pair-split here tripped a Mosaic relayout bug on the
    # following f32 convert)
    h = h.astype(jnp.bfloat16).reshape(A, B, J * C)
    h = jnp.max(h.reshape(A // 2, 2, B, J * C), axis=1)
    h = h.swapaxes(0, 1)                               # (B, A/2, JC)
    h = jnp.max(h.reshape(B // 2, 2, A // 2, J * C), axis=1)
    m = jnp.sum(h.astype(jnp.float32), axis=(0, 1)) / ((A // 2) * (B // 2))
    out_ref[0] = jnp.broadcast_to(m[None, :], (8, J * C)
                                  ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_joints",))
def pack_weightnet_pool(conv_kernel: jax.Array, conv_bias: jax.Array,
                        affine: jax.Array, num_joints: int) -> dict:
    """Block-diagonal grouped-conv matrix + folded affine as one array
    pytree — computed once at model load (engine/packing.py) instead of
    per jitted call. conv_kernel: (3, 3, 1, C); conv_bias: (C,); affine:
    (2, C) folded BN (a, b)."""
    J = num_joints
    C = conv_kernel.shape[-1]
    w = conv_kernel.reshape(9, C)                      # (tap, C)
    eye = jnp.eye(J, dtype=w.dtype)
    # (9, J, J, C): w9[t, j, j', c] = w[t, c] * [j == j']
    w9 = w[:, None, None, :] * eye[None, :, :, None]
    wmat = w9.reshape(9 * J, J * C).astype(jnp.bfloat16)

    a, b = affine[0], affine[1]
    aff = jnp.stack([jnp.tile(a, J),
                     jnp.tile(a * conv_bias + b, J)]).astype(jnp.float32)
    return {"wmat": wmat, "aff": aff}


def pallas_weightnet_pool(planes: jax.Array, conv_kernel: jax.Array,
                          conv_bias: jax.Array, affine: jax.Array,
                          interpret: bool = False,
                          packed: dict | None = None) -> jax.Array:
    """planes: (N, A, B, J); conv_kernel: (3, 3, 1, C); conv_bias: (C,);
    affine: (2, C) folded BN (a, b). Returns (N, J, C) f32 — the
    mean-pooled features mean(pool2(relu(a*conv(x)+a*bias+b))) per (n, j),
    matching the reference op order (see module docstring). `packed`:
    optional pre-packed weights (pack_weightnet_pool)."""
    N, A, B, J = planes.shape
    C = conv_kernel.shape[-1]

    if packed is None:
        packed = pack_weightnet_pool(conv_kernel, conv_bias, affine, J)
    wmat, aff = packed["wmat"], packed["aff"]

    xp = jnp.pad(planes, ((0, 0), (1, 1), (1, 1), (0, 0))
                 ).astype(jnp.bfloat16)

    kernel = functools.partial(_weightnet_kernel, A=A, B=B, J=J, C=C)
    out = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, A + 2, B + 2, J), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * J, J * C), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, J * C), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, J * C), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8, J * C), jnp.float32),
        interpret=interpret,
    )(xp, wmat, aff)
    return out[:, 0].reshape(N, J, C)
