"""Shared conv building blocks (2D and 1D), NHWC/NWC layouts.

Behavioral reference: /root/reference/lib/models/cnns_2d.py:12-182 and
cnns_1d.py:10-179 — Basic (conv+BN+ReLU), Res (two 3x convs + projection
skip), Pool (max 2x), Upsample (stride-2 transposed conv + BN + ReLU), and the
2-level encoder-decoder with residual skip paths.

TPU notes: channels-last layouts so XLA tiles convs onto the MXU; BatchNorm
momentum matches torch's 0.1 (flax convention: momentum=0.9); conv weights use
the reference's normal(0, 0.001) init where the reference initializes
explicitly (cnns_2d.py:224-232).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

INIT = nn.initializers.normal(stddev=0.001)


class BNVars(nn.Module):
    """Param-holder matching nn.BatchNorm's variable names/shapes without
    running the op: used by Pallas inference paths that consume the folded
    affine directly while keeping checkpoints interchangeable with the
    nn.BatchNorm training path."""
    features: int

    @nn.compact
    def __call__(self):
        from fvp_tpu.ops.pallas.deconv_head import bn_affine

        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((f,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((f,), jnp.float32))
        return bn_affine(scale, bias, mean.value, var.value)


class BasicBlock(nn.Module):
    """Conv(k) + BN + ReLU, rank-agnostic (1D or 2D via `dims`)."""
    features: int
    kernel: int
    dims: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel,) * self.dims, padding="SAME",
                    dtype=self.dtype, kernel_init=INIT,
                    bias_init=nn.initializers.zeros)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    """conv3-BN-ReLU-conv3-BN + (1x projection) skip, ReLU at the join."""
    features: int
    dims: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (3,) * self.dims
        r = nn.Conv(self.features, k, padding="SAME", dtype=self.dtype,
                    kernel_init=INIT, bias_init=nn.initializers.zeros)(x)
        r = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(r)
        r = nn.relu(r)
        r = nn.Conv(self.features, k, padding="SAME", dtype=self.dtype,
                    kernel_init=INIT, bias_init=nn.initializers.zeros)(r)
        r = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(r)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1,) * self.dims, padding="VALID",
                        dtype=self.dtype, kernel_init=INIT,
                        bias_init=nn.initializers.zeros)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
        return nn.relu(r + x.astype(r.dtype))


def max_pool(x, dims: int, window: int = 2):
    return nn.max_pool(x, (window,) * dims, strides=(window,) * dims)


class UpsampleBlock(nn.Module):
    """Stride-2 transposed conv (kernel 2) + BN + ReLU: exact 2x upsample."""
    features: int
    dims: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # SAME padding with stride 2 / kernel 2 reproduces torch
        # ConvTranspose(k=2, s=2, p=0): exact 2x (verified numerically)
        x = nn.ConvTranspose(self.features, (2,) * self.dims,
                             strides=(2,) * self.dims, padding="SAME",
                             dtype=self.dtype, kernel_init=INIT,
                             bias_init=nn.initializers.zeros)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return nn.relu(x)


class EncoderDecoder(nn.Module):
    """Two-level hourglass with residual skips (cnns_2d.py:128-182):
    32 -> 64 -> 128 channels down, mirrored up, skip adds at each level."""
    dims: int = 2
    channels: Sequence[int] = (32, 64, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c0, c1, c2 = self.channels
        d = self.dtype
        skip1 = ResBlock(c0, self.dims, d)(x, train)
        x = max_pool(x, self.dims)
        x = ResBlock(c1, self.dims, d)(x, train)

        skip2 = ResBlock(c1, self.dims, d)(x, train)
        x = max_pool(x, self.dims)
        x = ResBlock(c2, self.dims, d)(x, train)

        x = ResBlock(c2, self.dims, d)(x, train)

        x = ResBlock(c2, self.dims, d)(x, train)
        x = UpsampleBlock(c1, self.dims, d)(x, train)
        x = x + skip2

        x = ResBlock(c1, self.dims, d)(x, train)
        x = UpsampleBlock(c0, self.dims, d)(x, train)
        x = x + skip1
        return x
