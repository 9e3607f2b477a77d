"""The four task networks: CenterNet (BEV center + bbox), C2CNet (1D height),
P2PNet (tri-plane joint heatmaps), WeightNet (fusion weights).

Behavioral reference: /root/reference/lib/models/cnns_2d.py:185-305,
cnns_1d.py:182-242, weight_net.py:48-80. All operate channels-last.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from typing import Any

from fvp_tpu.models.blocks import (
    INIT, BasicBlock, EncoderDecoder, ResBlock, max_pool,
)


class CenterNet(nn.Module):
    """BEV detector: input the whole-space volume (B, X, Y, Z, J); max over z
    collapses to the bird's-eye view, then front convs + hourglass + two
    heads -> (center heatmap (B, X, Y, 1), bbox sizes (B, X, Y, 2))."""
    head_conv: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, volume, train: bool = False):
        d = self.dtype
        x = jnp.max(volume, axis=3)                      # (B, X, Y, J)
        x = BasicBlock(16, 7, dims=2, dtype=d)(x, train)
        x = ResBlock(32, dims=2, dtype=d)(x, train)
        x = EncoderDecoder(dims=2, dtype=d)(x, train)

        hm = nn.Conv(self.head_conv, (3, 3), padding="SAME", dtype=d,
                     kernel_init=INIT, bias_init=nn.initializers.zeros)(x)
        hm = nn.relu(hm)
        hm = nn.Conv(1, (1, 1), padding="VALID", kernel_init=INIT,
                     bias_init=nn.initializers.zeros)(hm.astype(jnp.float32))

        size = nn.Conv(self.head_conv, (3, 3), padding="SAME", dtype=d,
                       kernel_init=INIT, bias_init=nn.initializers.zeros)(x)
        size = nn.relu(size)
        size = nn.Conv(2, (1, 1), padding="VALID", kernel_init=INIT,
                       bias_init=nn.initializers.zeros)(
                           size.astype(jnp.float32))
        return hm, size


class C2CNet(nn.Module):
    """1D height regressor over per-proposal z-columns:
    (N, Z, J) -> (N, Z) height heatmap."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = BasicBlock(16, 7, dims=1, dtype=d)(x, train)
        x = ResBlock(32, dims=1, dtype=d)(x, train)
        x = EncoderDecoder(dims=1, dtype=d)(x, train)
        x = nn.Conv(1, (1,), padding="VALID", kernel_init=INIT,
                    bias_init=nn.initializers.zeros)(x.astype(jnp.float32))
        return x[..., 0]


class P2PNet(nn.Module):
    """Plane-to-pose net: (N, A, B, J) plane stacks -> per-joint plane
    heatmaps (N, A, B, J).

    `mask` (train only): (G, M) per-scene sample mask with N = G*M
    group-major — train-mode BN statistics are then computed per scene
    over matched persons only, replicating the reference's per-batch-item
    JLN loop (joint_localization_net.py:148-162); see
    blocks.MaskedBatchNorm."""
    num_joints: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        d = self.dtype
        x = BasicBlock(16, 7, dims=2, dtype=d)(x, train, mask)
        x = ResBlock(32, dims=2, dtype=d)(x, train, mask)
        x = EncoderDecoder(dims=2, dtype=d)(x, train, mask)
        return nn.Conv(self.num_joints, (1, 1), padding="VALID",
                       kernel_init=INIT,
                       bias_init=nn.initializers.zeros)(
                           x.astype(jnp.float32))


class _ConvParams(nn.Module):
    """Param-holder matching nn.Conv's names/shapes (pallas path)."""
    kernel: tuple
    features: int

    @nn.compact
    def __call__(self, cin: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (*self.kernel, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class WeightNet(nn.Module):
    """Per-(plane, person, joint) scalar fusion weight from each plane
    heatmap: conv+BN+maxpool+ReLU -> global average pool -> 2-layer MLP ->
    sigmoid (reference weight_net.py:55-80; note the reference never calls
    its _initialize_weights, so default inits apply here too).

    At inference on TPU the conv+BN+pool+mean front end runs as one fused
    Pallas kernel (ops/pallas/weightnet.py) reading the same parameters;
    training and CPU use the XLA module path (identical math, pool/relu
    commute — both monotone)."""
    feat_channels: int = 32
    hidden_channels: int = 64
    dtype: Any = jnp.float32
    use_pallas: Any = None     # None = auto (inference on TPU)

    @nn.compact
    def __call__(self, x, train: bool = False, mask=None):
        import jax

        # x: (N, A, B, J) plane heatmaps; one joint map per weight
        # mask (train only): (G, M) per-scene sample mask over N = G*M —
        # see P2PNet; expanded by J below for the per-(person, joint)
        # entries this net flattens to
        n, a, b, j = x.shape
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        use_pallas = use_pallas and not train   # kernel is inference-only
        if use_pallas:
            from fvp_tpu.models.blocks import BNVars
            from fvp_tpu.ops.pallas.weightnet import pallas_weightnet_pool

            kern, kbias = _ConvParams((3, 3), self.feat_channels,
                                      name="Conv_0")(1)
            aff = BNVars(self.feat_channels, name="BatchNorm_0")()
            x = pallas_weightnet_pool(
                x, kern, kbias, aff,
                interpret=jax.default_backend() != "tpu",
                packed=(self.get_variable("packed", "fused")
                        if self.has_variable("packed", "fused") else None))
            x = x.reshape(n * j, self.feat_channels)
        else:
            from fvp_tpu.models.blocks import _bn

            x = x.transpose(0, 3, 1, 2).reshape(n * j, a, b, 1)
            jmask = (jnp.repeat(mask, j, axis=1)
                     if mask is not None else None)
            x = nn.Conv(self.feat_channels, (3, 3), padding="SAME",
                        dtype=self.dtype)(x)
            x = _bn(x, train, jmask, self.dtype, "BatchNorm_0")
            x = max_pool(x, dims=2)
            x = nn.relu(x)
            x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # global pool
        x = nn.Dense(self.hidden_channels)(x)
        x = nn.relu(x)
        x = nn.Dense(1)(x)
        x = nn.sigmoid(x)
        return x.reshape(n, j, 1)
