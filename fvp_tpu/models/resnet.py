"""Pose-ResNet backbone: ResNet trunk + 3 stride-2 deconv layers + 1x1 head.

Behavioral reference: /root/reference/lib/models/resnet.py:98-215 (ResNet-50
default: Bottleneck [3,4,6,3], 256-channel 4x4 deconvs, final 1x1 conv to
per-joint heatmaps at 1/4 input resolution).

NHWC throughout. `convert_torch_state` maps a torch state dict (the published
pose_resnet50_panoptic checkpoint, or any torch model built from the reference
class) into this module's params, so frozen-backbone Panoptic inference
reproduces reference heatmaps (parity-tested in tests/test_resnet.py against a
torch model loaded from the reference source).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            dtype=self.dtype)(x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=d,
                      name="conv1")(x)
        out = _BN(dtype=d, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=d,
                      name="conv2")(out)
        out = _BN(dtype=d, name="bn2")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=d,
                      name="conv3")(out)
        out = _BN(dtype=d, name="bn3")(out, train)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=d, name="down_conv")(x)
            residual = _BN(dtype=d, name="down_bn")(residual, train)
        return nn.relu(out + residual.astype(out.dtype))


class BasicResBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=d,
                      name="conv1")(x)
        out = _BN(dtype=d, name="bn1")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=d, name="conv2")(out)
        out = _BN(dtype=d, name="bn2")(out, train)
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=d, name="down_conv")(x)
            residual = _BN(dtype=d, name="down_bn")(residual, train)
        return nn.relu(out + residual.astype(out.dtype))


class PoseResNet(nn.Module):
    num_joints: int
    num_layers: int = 50
    deconv_filters: Sequence[int] = (256, 256, 256)
    final_kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) normalized image -> (B, H/4, W/4, num_joints)."""
        kind, layers = RESNET_SPECS[self.num_layers]
        block = Bottleneck if kind == "bottleneck" else BasicResBlock
        expansion = 4 if kind == "bottleneck" else 1
        d = self.dtype

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=d, name="conv1")(x)
        x = _BN(dtype=d, name="bn1")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                down = bi == 0 and (stride != 1
                                    or inplanes != planes * expansion)
                x = block(planes, stride if bi == 0 else 1, down, dtype=d,
                          name=f"layer{li + 1}_{bi}")(x, train)
            inplanes = planes * expansion

        for di, feats in enumerate(self.deconv_filters):
            # torch ConvTranspose(k=4, s=2, p=1) == flax SAME (verified)
            x = nn.ConvTranspose(feats, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False, dtype=d,
                                 name=f"deconv{di}")(x)
            x = _BN(dtype=d, name=f"deconv_bn{di}")(x, train)
            x = nn.relu(x)

        pad = ((1, 1), (1, 1)) if self.final_kernel == 3 else "VALID"
        x = nn.Conv(self.num_joints,
                    (self.final_kernel,) * 2, padding=pad,
                    name="final_layer")(x.astype(jnp.float32))
        return x


# ---------------------------------------------------------------------------
# torch -> flax state conversion
# ---------------------------------------------------------------------------

def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _deconv_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose (I, O, kh, kw) -> flax (kh, kw, I, O) with
    spatial flip (transpose_kernel=False semantics; verified numerically)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def convert_torch_state(state: Mapping[str, Any], num_layers: int = 50,
                        num_deconvs: int = 3):
    """Convert a reference Pose-ResNet torch state dict (numpy-valued) into
    {'params': ..., 'batch_stats': ...} for PoseResNet."""
    state = {k: np.asarray(v) for k, v in state.items()}
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def put_bn(dst: str, src: str):
        params[dst] = {"BatchNorm_0": {
            "scale": state[f"{src}.weight"],
            "bias": state[f"{src}.bias"],
        }}
        stats[dst] = {"BatchNorm_0": {
            "mean": state[f"{src}.running_mean"],
            "var": state[f"{src}.running_var"],
        }}

    def conv_entry(src: str, bias: bool = False):
        e = {"kernel": _conv_w(state[f"{src}.weight"])}
        if bias:
            e["bias"] = state[f"{src}.bias"]
        return e

    params["conv1"] = conv_entry("conv1")
    put_bn("bn1", "bn1")

    _, layer_blocks = RESNET_SPECS[num_layers]
    kind = RESNET_SPECS[num_layers][0]
    n_convs = 3 if kind == "bottleneck" else 2
    for li, blocks in enumerate(layer_blocks):
        for bi in range(blocks):
            t = f"layer{li + 1}.{bi}"
            name = f"layer{li + 1}_{bi}"
            entry: dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                entry[f"conv{ci}"] = conv_entry(f"{t}.conv{ci}")
            if f"{t}.downsample.0.weight" in state:
                entry["down_conv"] = conv_entry(f"{t}.downsample.0")
            params[name] = entry
            for ci in range(1, n_convs + 1):
                put_bn_nested(params, stats, name, f"bn{ci}", state,
                              f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in state:
                put_bn_nested(params, stats, name, "down_bn", state,
                              f"{t}.downsample.1")

    for di in range(num_deconvs):
        params[f"deconv{di}"] = {
            "kernel": _deconv_w(state[f"deconv_layers.{di * 3}.weight"])}
        put_bn(f"deconv_bn{di}", f"deconv_layers.{di * 3 + 1}")

    params["final_layer"] = conv_entry("final_layer", bias=True)
    return {"params": params, "batch_stats": stats}


def put_bn_nested(params: dict, stats: dict, block: str, bn: str,
                  state: Mapping[str, Any], src: str) -> None:
    params[block][bn] = {"BatchNorm_0": {
        "scale": state[f"{src}.weight"],
        "bias": state[f"{src}.bias"],
    }}
    stats.setdefault(block, {})[bn] = {"BatchNorm_0": {
        "mean": state[f"{src}.running_mean"],
        "var": state[f"{src}.running_var"],
    }}
