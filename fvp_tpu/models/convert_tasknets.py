"""Torch -> fvp weight converters for the four task networks.

Maps a reference-model torch state dict (lib/models/faster_voxelpose.py:41-42
-> pose_net.{center_net,c2c_net} / joint_net.{conv_net,weight_net}) onto the
fvp flax parameter trees (models/cnns.py / models/blocks.py), so the torch
arm's weights can be transplanted into fvp bit-for-bit. This is the
instrument for the weight-transplant lockstep A/B (tools/ab_lockstep.py):
identical weights + identical batches isolate the frameworks' training-math
asymmetries from init/seed draws.

Layer-name correspondence (reference -> flax auto-names):
  Basic{1,2}DBlock .block.{0,1}            -> BasicBlock_k {Conv_0, BatchNorm_0}
  Res{1,2}DBlock   .res_branch.{0,1,3,4}   -> ResBlock_k {Conv_0, BatchNorm_0,
                   (.skip_con.{0,1})           Conv_1, BatchNorm_1
                                               (, Conv_2, BatchNorm_2)}
  Upsample{1,2}D   .block.{0,1}            -> UpsampleBlock_k {ConvTranspose_0,
                                               BatchNorm_0}
  EncoderDecorder (cnns_2d.py:128-182, cnns_1d.py:125-179):
    skip_res1 -> ResBlock_0   encoder_res1 -> ResBlock_1
    skip_res2 -> ResBlock_2   encoder_res2 -> ResBlock_3
    mid_res   -> ResBlock_4   decoder_res2 -> ResBlock_5
    decoder_upsample2 -> UpsampleBlock_0
    decoder_res1      -> ResBlock_6
    decoder_upsample1 -> UpsampleBlock_1
  (flax assigns per-type counters in __call__ execution order,
   models/blocks.py EncoderDecoder.__call__ — verified by the parity tests
   in tests/test_convert_tasknets.py)
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(state: Mapping[str, Any], key: str) -> np.ndarray:
    v = state[key]
    return np.ascontiguousarray(
        v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (O, I, kh, kw) -> flax (kh, kw, I, O);
    Conv1d (O, I, k) -> flax (k, I, O)."""
    if w.ndim == 4:
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def _deconv_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose{1,2}d (I, O, k...) -> flax ConvTranspose
    (k..., I, O) with spatial flip (flax applies the kernel flipped for
    transpose_kernel=False — same derivation as
    models/resnet.py::_deconv_w, verified by the parity tests)."""
    if w.ndim == 4:
        return np.ascontiguousarray(
            np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1))[::-1])


class _Builder:
    """Accumulates the (params, batch_stats) trees for one flax module."""

    def __init__(self, state: Mapping[str, Any]):
        self.state = state
        self.params: dict[str, Any] = {}
        self.stats: dict[str, Any] = {}

    def conv(self, dst: str, src: str, deconv: bool = False,
             into: tuple[dict, dict] | None = None) -> None:
        params = into[0] if into else self.params
        w = _np(self.state, f"{src}.weight")
        params[dst] = {
            "kernel": (_deconv_w if deconv else _conv_w)(w),
            "bias": _np(self.state, f"{src}.bias"),
        }

    def bn(self, dst: str, src: str,
           into: tuple[dict, dict] | None = None) -> None:
        params, stats = into if into else (self.params, self.stats)
        params[dst] = {"scale": _np(self.state, f"{src}.weight"),
                       "bias": _np(self.state, f"{src}.bias")}
        stats[dst] = {"mean": _np(self.state, f"{src}.running_mean"),
                      "var": _np(self.state, f"{src}.running_var")}

    def dense(self, dst: str, src: str) -> None:
        self.params[dst] = {
            "kernel": np.ascontiguousarray(
                _np(self.state, f"{src}.weight").T),
            "bias": _np(self.state, f"{src}.bias"),
        }

    # -- composite blocks -------------------------------------------------
    def _sub(self, dst: str) -> tuple[dict, dict]:
        p = self.params.setdefault(dst, {})
        s = self.stats.setdefault(dst, {})
        return p, s

    def basic_block(self, dst: str, src: str) -> None:
        into = self._sub(dst)
        self.conv("Conv_0", f"{src}.block.0", into=into)
        self.bn("BatchNorm_0", f"{src}.block.1", into=into)

    def res_block(self, dst: str, src: str) -> None:
        into = self._sub(dst)
        self.conv("Conv_0", f"{src}.res_branch.0", into=into)
        self.bn("BatchNorm_0", f"{src}.res_branch.1", into=into)
        self.conv("Conv_1", f"{src}.res_branch.3", into=into)
        self.bn("BatchNorm_1", f"{src}.res_branch.4", into=into)
        if f"{src}.skip_con.0.weight" in self.state:    # projection skip
            self.conv("Conv_2", f"{src}.skip_con.0", into=into)
            self.bn("BatchNorm_2", f"{src}.skip_con.1", into=into)

    def upsample_block(self, dst: str, src: str) -> None:
        into = self._sub(dst)
        self.conv("ConvTranspose_0", f"{src}.block.0", deconv=True,
                  into=into)
        self.bn("BatchNorm_0", f"{src}.block.1", into=into)

    def encoder_decoder(self, dst: str, src: str) -> None:
        outer_p, outer_s = self.params, self.stats
        self.params, self.stats = self._sub(dst)
        try:
            self.res_block("ResBlock_0", f"{src}.skip_res1")
            self.res_block("ResBlock_1", f"{src}.encoder_res1")
            self.res_block("ResBlock_2", f"{src}.skip_res2")
            self.res_block("ResBlock_3", f"{src}.encoder_res2")
            self.res_block("ResBlock_4", f"{src}.mid_res")
            self.res_block("ResBlock_5", f"{src}.decoder_res2")
            self.upsample_block("UpsampleBlock_0", f"{src}.decoder_upsample2")
            self.res_block("ResBlock_6", f"{src}.decoder_res1")
            self.upsample_block("UpsampleBlock_1", f"{src}.decoder_upsample1")
        finally:
            self.params, self.stats = outer_p, outer_s


def convert_center_net(state, prefix: str = "pose_net.center_net"):
    """CenterNet (cnns_2d.py:233-305): front + hourglass + hm/size heads."""
    b = _Builder(state)
    b.basic_block("BasicBlock_0", f"{prefix}.front_layers.0")
    b.res_block("ResBlock_0", f"{prefix}.front_layers.1")
    b.encoder_decoder("EncoderDecoder_0", f"{prefix}.encoder_decoder")
    b.conv("Conv_0", f"{prefix}.output_hm.0")       # hm 3x3
    b.conv("Conv_1", f"{prefix}.output_hm.2")       # hm 1x1
    b.conv("Conv_2", f"{prefix}.output_size.0")     # size 3x3
    b.conv("Conv_3", f"{prefix}.output_size.2")     # size 1x1
    return b.params, b.stats


def convert_c2c_net(state, prefix: str = "pose_net.c2c_net"):
    """C2CNet (cnns_1d.py:182-229): 1D front + hourglass + output conv."""
    b = _Builder(state)
    b.basic_block("BasicBlock_0", f"{prefix}.front_layers.0")
    b.res_block("ResBlock_0", f"{prefix}.front_layers.1")
    b.encoder_decoder("EncoderDecoder_0", f"{prefix}.encoder_decoder")
    b.conv("Conv_0", f"{prefix}.output_hm")
    return b.params, b.stats


def convert_p2p_net(state, prefix: str = "joint_net.conv_net"):
    """P2PNet (cnns_2d.py:185-232)."""
    b = _Builder(state)
    b.basic_block("BasicBlock_0", f"{prefix}.front_layers.0")
    b.res_block("ResBlock_0", f"{prefix}.front_layers.1")
    b.encoder_decoder("EncoderDecoder_0", f"{prefix}.encoder_decoder")
    b.conv("Conv_0", f"{prefix}.output_layer")
    return b.params, b.stats


def convert_weight_net(state, prefix: str = "joint_net.weight_net"):
    """WeightNet (weight_net.py:48-80): conv+BN front, 2-layer MLP head."""
    b = _Builder(state)
    b.conv("Conv_0", f"{prefix}.heatmap_feature_net.0")
    b.bn("BatchNorm_0", f"{prefix}.heatmap_feature_net.1")
    b.dense("Dense_0", f"{prefix}.output.0")
    b.dense("Dense_1", f"{prefix}.output.2")
    return b.params, b.stats


def convert_task_nets(state: Mapping[str, Any]) -> dict[str, Any]:
    """Full-model torch state dict -> {'params', 'batch_stats'} trees for
    FasterVoxelPose (models/faster_voxelpose.py setup names)."""
    out_p: dict[str, Any] = {}
    out_s: dict[str, Any] = {}
    for name, fn in (("center_net", convert_center_net),
                     ("c2c_net", convert_c2c_net),
                     ("p2p_net", convert_p2p_net),
                     ("weight_net", convert_weight_net)):
        p, s = fn(state)
        out_p[name] = p
        if s:
            out_s[name] = s
    return {"params": out_p, "batch_stats": out_s}
