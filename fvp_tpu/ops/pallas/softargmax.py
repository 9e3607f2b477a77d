"""Pallas TPU kernel: fused temperature soft-argmax over tri-plane heatmaps.

Semantics of /root/reference/lib/models/joint_localization_net.py:15-56 in a
single VMEM pass per (plane, person) map: max-subtracted softmax(beta * x)
over the flattened plane, expectation against the plane's mm-coordinate
grid, and the per-map peak probability — without materializing the
(3, P, N, J) probability tensor in HBM (the XLA path round-trips it three
times: softmax out, max reduce, einsum in).

Layout: one grid step per (plane s, person p). The plane block (N, J) keeps
the flattened spatial axis N on sublanes and joints on lanes, so the
softmax reductions are lane-parallel sublane reductions and the coordinate
expectation is one MXU matmul against the (2, N) transposed grid:

    m      = max_n x[n, j]
    e      = exp(beta * (x - m))              # max prob == exp(0) == 1
    Z[j]   = sum_n e[n, j]
    out    = [[gx; gy] @ e / Z,               # (2, J) mm expectation
              1 / Z]                          # (1, J) peak probability

The padded lanes (J -> 128) carry garbage but never cross lanes; callers
slice [:J]. N must be a multiple of 8 (sublane tile) — true for every
square plane of even side (ind_voxels_per_axis is 64 in all configs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softargmax_kernel(x_ref, g_ref, o_ref, *, beta):
    x = x_ref[0, 0].astype(jnp.float32) * beta      # (N, J)
    m = jnp.max(x, axis=0, keepdims=True)           # (1, J)
    e = jnp.exp(x - m)                              # (N, J)
    z = jnp.sum(e, axis=0, keepdims=True)           # (1, J)
    g = g_ref[0].astype(jnp.float32)                # (2, N)
    r = jax.lax.dot_general(                        # (2, J) on the MXU
        g, e, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = jnp.concatenate([r / z, 1.0 / z], axis=0)


@functools.partial(jax.jit, static_argnames=("beta", "interpret"))
def pallas_soft_argmax(planes: jax.Array, center_grid: jax.Array,
                       beta: float, interpret: bool = False):
    """planes: (3, P, N, J) flattened plane heatmaps;
    center_grid: (3, N, 2) plane mm coordinates.

    Returns (coords (3, P, J, 2), confs (P,)) — bit-compatible with
    fvp_tpu.ops.softargmax.soft_argmax up to fp reassociation."""
    S, P, N, J = planes.shape
    assert N % 8 == 0, f"flattened plane size {N} must be sublane-aligned"
    gT = jnp.transpose(center_grid, (0, 2, 1))      # (3, 2, N)

    out = pl.pallas_call(
        functools.partial(_softargmax_kernel, beta=float(beta)),
        grid=(S, P),
        in_specs=[
            pl.BlockSpec((1, 1, N, J), lambda s, p: (s, p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, N), lambda s, p: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 3, J), lambda s, p: (s, p, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, P, 3, J), jnp.float32),
        interpret=interpret,
    )(planes, gT)

    coords = jnp.transpose(out[:, :, 0:2, :], (0, 1, 3, 2))  # (3, P, J, 2)
    confs = jnp.mean(out[:, :, 2, :], axis=(0, 2))           # (P,)
    return coords, confs
