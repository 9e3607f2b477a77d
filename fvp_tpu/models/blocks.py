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
import jax
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


class MaskedBatchNorm(nn.Module):
    """Train-mode BatchNorm with per-GROUP masked batch statistics.

    Replicates the reference JLN's batching exactly: P2PNet/WeightNet run
    once PER BATCH ITEM on only that scene's matched persons
    (joint_localization_net.py:148-175), so torch's train-mode BN (a)
    computes batch statistics per scene over real persons only — never
    over the fixed-K padding fvp carries for jit shapes — and (b) updates
    the running stats SEQUENTIALLY, once per scene, skipping scenes with
    no matched person, using torch's unbiased-variance convention for the
    running update (biased for normalization).

    `mask`: (G, M) over the batch axis factored group-major (the caller
    reorders entries so each group's members are contiguous). Entries with
    mask 0 are excluded from statistics but still normalized with their
    group's stats (their outputs are masked from the loss downstream; a
    zero-count group normalizes to garbage that is likewise masked).

    Param/variable names match nn.BatchNorm ('scale'/'bias';
    'mean'/'var') so checkpoints and the torch converters interchange —
    instantiate with name='BatchNorm_k'."""
    momentum: float = 0.9
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        f = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((f,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((f,), jnp.float32))
        G, M = mask.shape
        xg = x.reshape(G, M, -1, f).astype(jnp.float32)      # (G, M, S, f)
        S = xg.shape[2]
        m = mask.reshape(G, M, 1, 1).astype(jnp.float32)
        cnt = jnp.sum(m, axis=(1, 2, 3)) * S                 # (G,)
        safe = jnp.maximum(cnt, 1.0)[:, None]
        mean = jnp.sum(xg * m, axis=(1, 2)) / safe           # (G, f)
        var = jnp.sum((xg - mean[:, None, None, :]) ** 2 * m,
                      axis=(1, 2)) / safe
        inv = jax.lax.rsqrt(var + self.eps)
        y = (xg - mean[:, None, None, :]) * inv[:, None, None, :]
        y = y * scale + bias
        # zero the masked entries: they are excluded from every loss, and
        # normalizing them against stats they did not contribute to can
        # amplify layer-over-layer into inf/NaN that would poison the
        # loss masking (0 * NaN). No op in these nets mixes entries except
        # this one, so zeroing is exact for the real entries.
        y = y * m
        y = y.reshape(x.shape).astype(x.dtype)

        if not self.is_initializing():
            # closed form of torch's sequential per-scene update
            # running <- r*running + (1-r)*stat for each VALID group in
            # order: r^V * old + sum_i valid_i*(1-r)*r^{#valid after i}*stat_i
            valid = (cnt > 0).astype(jnp.float32)            # (G,)
            r = self.momentum
            suffix = (jnp.cumsum(valid[::-1])[::-1] - valid)
            w = (valid * (1.0 - r) * r ** suffix)[:, None]   # (G, 1)
            rpow = r ** jnp.sum(valid)
            unb = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))[:, None]
            ra_mean.value = rpow * ra_mean.value + jnp.sum(w * mean, 0)
            ra_var.value = rpow * ra_var.value + jnp.sum(w * unb, 0)
        return y


def _bn(x, train: bool, mask, dtype, name: str):
    """BatchNorm dispatch: standard flax BN, or the masked per-group
    variant when a (G, M) sample mask is given (train mode only). Both
    create identically-named variables."""
    if mask is not None and train:
        return MaskedBatchNorm(dtype=dtype, name=name)(x, mask)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        dtype=dtype, name=name)(x)


class BasicBlock(nn.Module):
    """Conv(k) + BN + ReLU, rank-agnostic (1D or 2D via `dims`)."""
    features: int
    kernel: int
    dims: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        x = nn.Conv(self.features, (self.kernel,) * self.dims, padding="SAME",
                    dtype=self.dtype, kernel_init=INIT,
                    bias_init=nn.initializers.zeros)(x)
        x = _bn(x, train, mask, self.dtype, "BatchNorm_0")
        return nn.relu(x)


class ResBlock(nn.Module):
    """conv3-BN-ReLU-conv3-BN + (1x projection) skip, ReLU at the join."""
    features: int
    dims: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        k = (3,) * self.dims
        r = nn.Conv(self.features, k, padding="SAME", dtype=self.dtype,
                    kernel_init=INIT, bias_init=nn.initializers.zeros)(x)
        r = _bn(r, train, mask, self.dtype, "BatchNorm_0")
        r = nn.relu(r)
        r = nn.Conv(self.features, k, padding="SAME", dtype=self.dtype,
                    kernel_init=INIT, bias_init=nn.initializers.zeros)(r)
        r = _bn(r, train, mask, self.dtype, "BatchNorm_1")
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1,) * self.dims, padding="VALID",
                        dtype=self.dtype, kernel_init=INIT,
                        bias_init=nn.initializers.zeros)(x)
            x = _bn(x, train, mask, self.dtype, "BatchNorm_2")
        return nn.relu(r + x.astype(r.dtype))


def max_pool(x, dims: int, window: int = 2):
    return nn.max_pool(x, (window,) * dims, strides=(window,) * dims)


class UpsampleBlock(nn.Module):
    """Stride-2 transposed conv (kernel 2) + BN + ReLU: exact 2x upsample."""
    features: int
    dims: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        # SAME padding with stride 2 / kernel 2 reproduces torch
        # ConvTranspose(k=2, s=2, p=0): exact 2x (verified numerically)
        x = nn.ConvTranspose(self.features, (2,) * self.dims,
                             strides=(2,) * self.dims, padding="SAME",
                             dtype=self.dtype, kernel_init=INIT,
                             bias_init=nn.initializers.zeros)(x)
        x = _bn(x, train, mask, self.dtype, "BatchNorm_0")
        return nn.relu(x)


class EncoderDecoder(nn.Module):
    """Two-level hourglass with residual skips (cnns_2d.py:128-182):
    32 -> 64 -> 128 channels down, mirrored up, skip adds at each level."""
    dims: int = 2
    channels: Sequence[int] = (32, 64, 128)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        c0, c1, c2 = self.channels
        d = self.dtype
        skip1 = ResBlock(c0, self.dims, d)(x, train, mask)
        x = max_pool(x, self.dims)
        x = ResBlock(c1, self.dims, d)(x, train, mask)

        skip2 = ResBlock(c1, self.dims, d)(x, train, mask)
        x = max_pool(x, self.dims)
        x = ResBlock(c2, self.dims, d)(x, train, mask)

        x = ResBlock(c2, self.dims, d)(x, train, mask)

        x = ResBlock(c2, self.dims, d)(x, train, mask)
        x = UpsampleBlock(c1, self.dims, d)(x, train, mask)
        x = x + skip2

        x = ResBlock(c1, self.dims, d)(x, train, mask)
        x = UpsampleBlock(c0, self.dims, d)(x, train, mask)
        x = x + skip1
        return x
