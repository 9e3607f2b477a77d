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
import jax
import jax.numpy as jnp
import numpy as np

RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _max_pool_3x3_s2(x):
    """3x3/s2 max-pool (pad 1) as separable strided-slice maxes.

    Identical output to flax nn.max_pool / lax.reduce_window (pinned in
    tools/microbench_stem.py and by the torch-parity backbone tests), but
    measured 0.57 ms faster fused behind the stem conv on v5e
    (reduce_window lowers to a windowed op on an awkward layout; three
    strided row-maxes + three column-maxes fuse into the stem's epilogue).
    """
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)),
                 constant_values=-jnp.inf)
    rows = None
    for dy in range(3):
        v = jax.lax.slice(xp, (0, dy, 0, 0), (B, dy + H, W, C),
                          (1, 2, 1, 1))
        rows = v if rows is None else jnp.maximum(rows, v)
    rp = jnp.pad(rows, ((0, 0), (0, 0), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)
    out = None
    for dx in range(3):
        v = jax.lax.slice(rp, (0, 0, dx, 0), (B, H // 2, dx + W, C),
                          (1, 1, 2, 1))
        out = v if out is None else jnp.maximum(out, v)
    return out


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


class _S2DStem(nn.Module):
    """The 7x7/s2 stem conv computed over a space-to-depth(2) input.

    A 3-channel stride-2 conv maps terribly onto the MXU (the contraction
    dim is 7*7*3 with channel minor = 3 of 128 lanes). Equivalent form:
    pad the kernel to 8x8 at the front, space-to-depth both kernel and
    input by 2, and run a stride-1 4x4 conv over 12 channels with
    padding (2, 1). The parameter keeps the canonical (7, 7, 3, F) shape
    ("conv1"/"kernel"), so torch conversion and checkpoints are unchanged;
    numerics are exact (zero-fill only adds zero taps)."""
    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax

        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, 3, self.features))
        wp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w2 = wp.reshape(4, 2, 4, 2, 3, self.features) \
            .transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, self.features)
        B, H, W, C = x.shape
        xs = x.reshape(B, H // 2, 2, W // 2, 2, C) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), w2.astype(self.dtype), (1, 1),
            ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(self.dtype)


class _FusedDeconv(nn.Module):
    """ConvTranspose(4x4, s2, SAME) as a 2x2 conv + depth-to-space.

    XLA lowers transposed convs through input dilation, spending 4x4xCin
    MACs per output where only 2x2xCin taps are nonzero — a 4x waste on
    the backbone's widest layers (Cin up to 2048). Exact equivalent: pad
    the input by 1, run one 2x2 VALID conv emitting all four output
    parities as channels (K2[u, v, ci, (r, s, co)] = k[2u+1-r, 2v+1-s,
    ci, co] — flax applies the transposed kernel flipped, derived and
    pinned numerically in tests/test_resnet.py), depth-to-space, and
    slice [1 : 2H+1]. The parameter keeps the ConvTranspose (4, 4, Cin,
    Cout) shape so torch conversion and checkpoints are unchanged."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import jax

        cin = x.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (4, 4, cin, self.features))
        t = jnp.stack([k[1::2], k[0::2]], axis=0)        # (r, u, kw, ci, co)
        t = jnp.stack([t[:, :, 1::2], t[:, :, 0::2]],
                      axis=0)                            # (s, r, u, v, ci, co)
        k2 = t.transpose(2, 3, 4, 1, 0, 5) \
            .reshape(2, 2, cin, 4 * self.features)       # (u, v, ci, rs*co)
        B, H, W, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), k2.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)          # (B, H+1, W+1, 4F)
        out = out.reshape(B, H + 1, W + 1, 2, 2, self.features)
        out = out.transpose(0, 1, 3, 2, 4, 5) \
            .reshape(B, 2 * H + 2, 2 * W + 2, self.features)
        return out[:, 1:2 * H + 1, 1:2 * W + 1].astype(self.dtype)


class _PolyphaseDeconv(nn.Module):
    """ConvTranspose(4x4, s2, SAME) evaluated on a PHASE-BLOCKED tensor.

    The cascade of three stride-2 deconvs is the backbone's second-hottest
    region, and both standard lowerings pay for it: input-dilation spends
    4x4xCin MACs per output with only 2x2xCin nonzero taps, and the
    per-stage 2x2-conv + depth-to-space rewrite (_FusedDeconv) materializes
    an interleaved 2x-resolution layout between every stage (measured
    slower on v5e — relayout traffic).

    This module never materializes the upsampled image. The full-res signal
    x[2^k·a + p] is carried as y[a, p] — spatial blocks at the CONSTANT
    backbone resolution with 2^k phase channels per axis — and one deconv
    stage is exactly:

      out[m] = K'[0] x[m-1] + K'[1] x[m]      (per axis; K'[u][r] =
                                               k[2u+1-r], the verified
                                               _FusedDeconv decomposition)

    where the x[m-1] tap is a phase rotation with a one-block spatial
    carry (two slices + concat, no relayout), so the whole stage collapses
    into ONE dense matmul (B·Hb·Wb·P², 4C) @ (4C, 4F) — MXU-shaped
    contraction (1024..8192) instead of three convs at 15-32-lane
    occupancy — plus static phase re-indexing:

      y'[2^{k+1} n + 2q + 0] = out[2^k n + q,     r=1]
      y'[2^{k+1} n + 2q + 1] = out[2^k n + q + 1, r=0]

    (the r/phase offsets absorb the SAME-padding crop of the canonical
    lowering). The single depth-to-space happens once, after the last
    stage, in PoseResNet. The parameter keeps the canonical ConvTranspose
    (4, 4, Cin, Cout) shape/name so torch conversion and checkpoints are
    unchanged; numerics are exact (parity-pinned in tests/test_resnet.py).
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y):
        import jax

        # y: (B, Hb, Wb, Py, Px, C); full-res x[2^k a + p] == y[a, ..., p]
        B, Hb, Wb, Py, Px, C = y.shape
        F = self.features
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (4, 4, C, F))
        # tap matrices K'[u, v]: (C, (r, s, F)) with
        # K'[u, v][ci, r, s, f] = k[2u+1-r, 2v+1-s, ci, f]
        t = jnp.stack([k[1::2], k[0::2]], axis=0)          # (r, u, kw, ci, f)
        t = jnp.stack([t[:, :, 1::2], t[:, :, 0::2]],
                      axis=1)                              # (r, s, u, v, ci, f)
        kt = t.transpose(2, 3, 4, 0, 1, 5).reshape(2, 2, C, 4 * F)

        # one zero block row/col at the spatial end: the boundary outputs
        # tap x[N] = 0 (SAME padding of the canonical lowering)
        yp = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0), (0, 0)))

        def prev(z, sa, pa):
            """z_prev[a, q] = x[block a, phase q-1]: phase rotation with a
            one-block spatial carry (x[-1] = 0 via the zero front pad)."""
            pad = [(0, 0)] * 6
            pad[sa] = (1, 0)
            shifted = jnp.pad(z, pad)
            shifted = jax.lax.slice_in_dim(shifted, 0, z.shape[sa], axis=sa)
            carry = jax.lax.slice_in_dim(shifted, z.shape[pa] - 1,
                                         z.shape[pa], axis=pa)
            rest = jax.lax.slice_in_dim(z, 0, z.shape[pa] - 1, axis=pa)
            return jnp.concatenate([carry, rest], axis=pa)

        tap01 = prev(yp, 1, 3)                 # u=0: x[m-1, w]
        taps = jnp.concatenate(
            [prev(tap01, 2, 4),                # (u, v) = (0, 0)
             tap01,                            # (0, 1)
             prev(yp, 2, 4),                   # (1, 0)
             yp], axis=-1)                     # (1, 1)
        kk = jnp.concatenate([kt[0, 0], kt[0, 1], kt[1, 0], kt[1, 1]],
                             axis=0)           # (4C, 4F)
        out = jnp.einsum("bhwpqc,cf->bhwpqf", taps.astype(self.dtype),
                         kk.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        o = out.reshape(B, Hb + 1, Wb + 1, Py, Px, 2, 2, F)

        # phase doubling, h axis: (Hb+1 blocks, Py, r) -> (Hb, 2Py)
        even = o[:, :Hb, :, :, :, 1]
        odd = jnp.concatenate(
            [o[:, :Hb, :, 1:, :, 0], o[:, 1:, :, :1, :, 0]], axis=3)
        oh = jnp.stack([even, odd], axis=4).reshape(
            B, Hb, Wb + 1, 2 * Py, Px, 2, F)
        # w axis: (Wb+1 blocks, Px, s) -> (Wb, 2Px)
        even = oh[:, :, :Wb, :, :, 1]
        odd = jnp.concatenate(
            [oh[:, :, :Wb, :, 1:, 0], oh[:, :, 1:, :, :1, 0]], axis=4)
        ow = jnp.stack([even, odd], axis=5).reshape(
            B, Hb, Wb, 2 * Py, 2 * Px, F)
        return ow.astype(self.dtype)


class _KernelParam(nn.Module):
    """Param-holder: declares a conv/ConvTranspose 'kernel' of the given
    shape (same name/shape/init as the nn module it stands in for) without
    running the op — the Pallas lowerings consume the raw parameter."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape)


class _HeadBN(nn.Module):
    """Param-holder matching nn.BatchNorm's variable tree
    (<name>/BatchNorm_0/{scale,bias} + batch_stats {mean,var}); returns the
    folded inference affine (2, F)."""
    features: int

    @nn.compact
    def __call__(self):
        from fvp_tpu.models.blocks import BNVars

        return BNVars(self.features, name="BatchNorm_0")()


class PoseResNet(nn.Module):
    """Backbone with selectable TPU lowerings for the stem and deconv head.

    stem: 'xla' (7x7/s2 conv) | 's2d' (_S2DStem space-to-depth rewrite).
    head: 'xla' (ConvTranspose) | 'fused' (_FusedDeconv per-stage rewrite)
          | 'polyphase' (_PolyphaseDeconv: all three stages phase-blocked
          at constant resolution, one depth-to-space at the end)
          | 'pallas' (ops/pallas/deconv_head.py: per-parity dense MXU
          matmuls, BN folded; inference-only — the measured-fastest head).
    All variants are numerically exact and checkpoint-compatible.

    Measured on TPU v5e (bf16, 5x512x960): XLA's native lowering beats the
    per-stage rewrites (stem 2.56 vs 4.46 ms, first deconv 1.96 vs 2.27 ms,
    last deconv 2.86 vs 3.38 ms) — relayout traffic outweighs the dilation
    savings the compiler already avoids. 'polyphase' removes the relayout
    traffic but materializes the 4-tap concat (4x the activation bytes at
    Cin up to 2048) and measured slower still: full backbone 9.11 ms vs
    6.91 ms native on the same run (bench.py, ITERS=40, 2026-08-18). The
    deconv head is HBM-bound, not MXU-bound — 'xla' stays the default."""
    num_joints: int
    num_layers: int = 50
    deconv_filters: Sequence[int] = (256, 256, 256)
    final_kernel: int = 1
    dtype: Any = jnp.float32
    stem: str = "xla"
    head: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) normalized image -> (B, H/4, W/4, num_joints)."""
        kind, layers = RESNET_SPECS[self.num_layers]
        block = Bottleneck if kind == "bottleneck" else BasicResBlock
        expansion = 4 if kind == "bottleneck" else 1
        d = self.dtype

        if self.stem == "host_s2d":
            # input contract: the DATA PIPELINE ships space-to-depth(2)
            # frames (B, H/2, W/2, 12) — see ops/pallas/stem.py (s2d_host
            # at the feed points); conv1+bn1+relu+maxpool run as one
            # fused Pallas kernel. Inference-only (folded BN).
            from fvp_tpu.ops.pallas.stem import pallas_stem

            if train:
                raise ValueError(
                    "stem='host_s2d' is inference-only (folded BN); use "
                    "stem='xla' for training")
            k = _KernelParam((7, 7, 3, 64), name="conv1")()
            aff = _HeadBN(64, name="bn1")()
            x = pallas_stem(x, k, aff,
                            interpret=jax.default_backend() != "tpu")
        else:
            if self.stem == "s2d":
                x = _S2DStem(64, dtype=d, name="conv1")(x)
            else:
                x = nn.Conv(64, (7, 7), strides=(2, 2),
                            padding=((3, 3), (3, 3)),
                            use_bias=False, dtype=d, name="conv1")(x)
            x = _BN(dtype=d, name="bn1")(x, train)
            x = nn.relu(x)
            x = _max_pool_3x3_s2(x)

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

        if self.head == "pallas":
            from fvp_tpu.ops.pallas.deconv_head import pallas_deconv_head

            if train:
                raise ValueError(
                    "head='pallas' is inference-only (folded BN running "
                    "stats); the backbone is frozen/eval in training — "
                    "use head='xla' if you need BN batch updates")
            kernels, affines = [], []
            cin = x.shape[-1]
            for di, feats in enumerate(self.deconv_filters):
                kernels.append(
                    _KernelParam((4, 4, cin, feats), name=f"deconv{di}")())
                affines.append(_HeadBN(feats, name=f"deconv_bn{di}")())
                cin = feats
            x = pallas_deconv_head(
                x, kernels, affines,
                interpret=jax.default_backend() != "tpu",
                packed=(self.get_variable("packed", "head_fused")
                        if self.has_variable("packed", "head_fused")
                        else None))
        elif self.head == "polyphase":
            # phase-blocked head: constant spatial res, one final d2s
            y = x[:, :, :, None, None, :]
            for di, feats in enumerate(self.deconv_filters):
                y = _PolyphaseDeconv(feats, dtype=d,
                                     name=f"deconv{di}")(y)
                y = _BN(dtype=d, name=f"deconv_bn{di}")(y, train)
                y = nn.relu(y)
            B, Hb, Wb, Py, Px, F = y.shape
            x = y.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, Hb * Py, Wb * Px, F)
        else:
            for di, feats in enumerate(self.deconv_filters):
                if self.head == "fused":
                    x = _FusedDeconv(feats, dtype=d, name=f"deconv{di}")(x)
                else:
                    # torch ConvTranspose(k=4, s=2, p=1) == flax SAME
                    # (verified)
                    x = nn.ConvTranspose(feats, (4, 4), strides=(2, 2),
                                         padding="SAME", use_bias=False,
                                         dtype=d, name=f"deconv{di}")(x)
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
