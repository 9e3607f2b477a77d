"""Pallas TPU kernels: the 2D hourglass task nets (P2PNet / CenterNet) as
single fused kernels.

The reference's plane-to-pose and BEV nets (lib/models/cnns_2d.py:128-305)
are ~30 small convs at 15-128 channels on 64x64 / 80x80 grids. At batch-1
serving shapes each XLA conv is a separate kernel launch on mostly-idle
hardware: measured round 3, P2PNet costs 2.2 ms and CenterNet 0.8 ms for
~0.5 GFLOP/item of actual work. This kernel runs one grid step per item
with every activation, skip tensor and weight resident in VMEM
(~6 MB total), so the whole net is one launch.

Formulation per conv: 3x3 convs accumulate 9 shifted (H*W, Cin) @ (Cin, F)
matmuls (contraction >= 32 rides the MXU fine); the 7x7 front with Cin=15
is too thin per tap, so its 49 taps are lane-concatenated into one
(H*W, 49*Cin) im2col matmul. 2x2-stride-2 transposed-conv upsampling is
four per-parity (H*W, Cin) @ (Cin, F) matmuls interleaved with
transpose-and-merge moves that only ever touch leading dims (Mosaic-safe).
BN running stats are folded into per-channel affines (inference only); the
flax module path remains the training path and the numerical reference
(tests/test_hourglass.py pins parity in interpret mode).

Layout rules observed throughout (see ops/pallas/sampler.py): channels on
lanes; (H, W, C) -> (H*W, C) merges only with W a multiple of 8 (so this
path requires spatial dims >= 8 at every pyramid level: 64/32/16 flagship;
smaller test configs fall back to XLA); transposes/stacks/merges never
touch the lane dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fvp_tpu.ops.pallas.deconv_head import bn_affine

_BF = jnp.bfloat16


# ---------------------------------------------------------------------------
# weight packing (XLA side)
# ---------------------------------------------------------------------------

def _fold(params, stats, conv: str, bn: str | None):
    """Fold conv bias + BN running stats into (a, a*bias + b)."""
    bias = params[conv].get("bias")
    if bn is None:
        a = jnp.ones_like(bias)
        return jnp.stack([a, bias]).astype(jnp.float32)
    p = params[bn]
    s = stats[bn]
    aff = bn_affine(p["scale"], p["bias"], s["mean"], s["var"])
    a, b = aff[0], aff[1]
    if bias is not None:
        b = a * bias + b
    return jnp.stack([a, b]).astype(jnp.float32)


def _conv_w(params, name: str):
    return params[name]["kernel"]


def _pack_res(params, stats, out):
    """ResBlock weights (fvp_tpu/models/blocks.py:41-65) in apply order."""
    proj = "Conv_2" in params
    out.append(_conv_w(params, "Conv_0").reshape(9, -1,
               params["Conv_0"]["kernel"].shape[-1]).astype(_BF))
    out.append(_fold(params, stats, "Conv_0", "BatchNorm_0"))
    out.append(_conv_w(params, "Conv_1").reshape(9, -1,
               params["Conv_1"]["kernel"].shape[-1]).astype(_BF))
    out.append(_fold(params, stats, "Conv_1", "BatchNorm_1"))
    if proj:
        out.append(_conv_w(params, "Conv_2")[0, 0].astype(_BF))
        out.append(_fold(params, stats, "Conv_2", "BatchNorm_2"))
    return proj


def _pack_upsample(params, stats, out):
    """UpsampleBlock: flax ConvTranspose(2,2,s2,SAME) == torch k2s2p0:
    y[2i+r, 2j+s] = x[i, j] @ kf[1-r, 1-s] (flax stores the spatially
    flipped kernel; pinned in tests)."""
    k = params["ConvTranspose_0"]["kernel"]          # (2, 2, Cin, F)
    wu = k[::-1, ::-1]                               # wu[r, s] = kf[1-r,1-s]
    out.append(wu.astype(_BF))
    p = params["BatchNorm_0"]
    s = stats["BatchNorm_0"]
    aff = bn_affine(p["scale"], p["bias"], s["mean"], s["var"])
    # UpsampleBlock's ConvTranspose keeps its bias (blocks.py:82-85)
    cb = params["ConvTranspose_0"]["bias"]
    out.append(jnp.stack([aff[0], aff[0] * cb + aff[1]]
                         ).astype(jnp.float32))


def hourglass_projs(params) -> tuple:
    """Static per-ResBlock projection flags (root, encoder 0-5, encoder 6)
    — pure Python structure inspection, shared by the 2D and 1D packers and
    by calls that consume pre-packed weights (so no XLA ops are traced to
    recover them)."""
    projs = ["Conv_2" in params["ResBlock_0"]]
    enc = params["EncoderDecoder_0"]
    for rb in ("ResBlock_0", "ResBlock_1", "ResBlock_2", "ResBlock_3",
               "ResBlock_4", "ResBlock_5", "ResBlock_6"):
        projs.append("Conv_2" in enc[rb])
    return tuple(projs)


def pack_hourglass_params(variables, front_kernel: int = 7):
    """Flatten a P2PNet/CenterNet-body variable tree into the kernel's
    ordered weight list. Returns (weights list, proj flags per ResBlock)."""
    params, stats = variables["params"], variables["batch_stats"]
    out: list = []
    projs: list = []

    fk = params["BasicBlock_0"]["Conv_0"]["kernel"]  # (7, 7, Cin, 16)
    kh, kw, cin, f = fk.shape
    assert kh == front_kernel
    out.append(fk.reshape(kh * kw * cin, f).astype(_BF))
    out.append(_fold(params["BasicBlock_0"], stats["BasicBlock_0"],
                     "Conv_0", "BatchNorm_0"))
    projs.append(_pack_res(params["ResBlock_0"], stats["ResBlock_0"], out))

    enc_p, enc_s = params["EncoderDecoder_0"], stats["EncoderDecoder_0"]
    for rb in ("ResBlock_0", "ResBlock_1", "ResBlock_2", "ResBlock_3",
               "ResBlock_4", "ResBlock_5"):
        projs.append(_pack_res(enc_p[rb], enc_s[rb], out))
    _pack_upsample(enc_p["UpsampleBlock_0"], enc_s["UpsampleBlock_0"], out)
    projs.append(_pack_res(enc_p["ResBlock_6"], enc_s["ResBlock_6"], out))
    _pack_upsample(enc_p["UpsampleBlock_1"], enc_s["UpsampleBlock_1"], out)
    return out, tuple(projs)


# ---------------------------------------------------------------------------
# in-kernel ops (operate on (H, W, C) values, channels on lanes)
# ---------------------------------------------------------------------------

def _mm(x2, w, F):
    return jax.lax.dot_general(
        x2.astype(w.dtype), w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _affine(h, aff, relu: bool):
    h = h * aff[0] + aff[1]
    return jnp.maximum(h, 0.0) if relu else h


def _wmask(W: int, valid_w, C: int):
    col = jax.lax.broadcasted_iota(jnp.int32, (1, W, C), 1)
    return col < valid_w


def _conv3(x, w_ref, aff, relu: bool, valid_w=None):
    """3x3 SAME conv by 9 shifted matmuls. x: (H, W, Cin) bf16;
    w_ref: (9, Cin, F). valid_w: if set, cols >= valid_w are re-zeroed
    after the affine (W is padded; zero cols == SAME-pad semantics for
    the next conv). Returns (H, W, F) f32."""
    H, W, Cin = x.shape
    F = w_ref.shape[-1]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((H * W, F), jnp.float32)
    for t in range(9):
        dy, dx = t // 3, t % 3
        acc = acc + _mm(xp[dy:dy + H, dx:dx + W, :].reshape(H * W, Cin),
                        w_ref[t], F)
    h = _affine(acc, aff, relu).reshape(H, W, F)
    if valid_w is not None:
        h = h * _wmask(W, valid_w, F).astype(h.dtype)
    return h


def _front_conv(x, w_ref, aff, kh: int):
    """kh x kh SAME front conv (thin Cin): im2col lane-concat, chunked by
    kernel row so at most (H*W, kh*Cin) is live at once (the full 49-tap
    im2col at 64x64 blew the VMEM stack)."""
    H, W, Cin = x.shape
    F = w_ref.shape[-1]
    p = kh // 2
    xp = jnp.pad(x, ((p, p), (p, p), (0, 0)))
    acc = jnp.zeros((H * W, F), jnp.float32)
    for dy in range(kh):
        taps = [xp[dy:dy + H, dx:dx + W, :].reshape(H * W, Cin)
                for dx in range(kh)]
        xrow = jnp.concatenate(taps, axis=1)         # (H*W, kh*Cin)
        acc = acc + _mm(xrow, w_ref[dy * kh * Cin:(dy + 1) * kh * Cin], F)
    return _affine(acc, aff, True).reshape(H, W, F)


def _resblock(x, refs, proj: bool, valid_w=None):
    """conv3-aff-relu, conv3-aff, (+1x1 proj-aff) skip, relu at the join."""
    w0, a0 = refs.pop(0), refs.pop(0)
    w1, a1 = refs.pop(0), refs.pop(0)
    h = _conv3(x, w0, a0[...], relu=True, valid_w=valid_w).astype(_BF)
    H, W, _ = h.shape
    F = w1.shape[-1]
    h2 = _conv3(h, w1, a1[...], relu=False)
    if proj:
        wp, ap = refs.pop(0), refs.pop(0)
        skip = _affine(_mm(x.reshape(H * W, -1), wp[...], F), ap[...],
                       relu=False).reshape(H, W, F)
    else:
        skip = x.astype(jnp.float32)
    out = jnp.maximum(h2 + skip, 0.0)
    if valid_w is not None:
        out = out * _wmask(W, valid_w, F).astype(out.dtype)
    return out.astype(_BF)


def _pool2(x):
    """2x2/s2 maxpool: leading-dim pair-splits + one transpose per axis
    (Mosaic has no strided vector slices)."""
    H, W, C = x.shape
    x = jnp.max(x.reshape(H // 2, 2, W, C), axis=1)
    x = x.swapaxes(0, 1)                             # (W, H/2, C)
    x = jnp.max(x.reshape(W // 2, 2, H // 2, C), axis=1)
    return x.swapaxes(0, 1)                          # (H/2, W/2, C)


def _interleave2(o00, o01, o10, o11):
    """y[2i+r, 2j+s] = o_rs[i, j] via leading-dim stacks/merges only."""
    H, W, F = o00.shape

    def cols(a, b):                                  # (H, W, F) x2 -> (H, 2W, F)
        z = jnp.stack([a.swapaxes(0, 1), b.swapaxes(0, 1)], axis=1)
        return z.reshape(2 * W, H, F).swapaxes(0, 1)

    z0 = cols(o00, o01)
    z1 = cols(o10, o11)
    return jnp.stack([z0, z1], axis=1).reshape(2 * H, 2 * W, F)


def _upsample(x, refs):
    """ConvTranspose(2,2,s2) + BN-affine + relu: 4 per-parity matmuls."""
    wu, aff = refs.pop(0), refs.pop(0)
    H, W, Cin = x.shape
    F = wu.shape[-1]
    x2 = x.reshape(H * W, Cin)
    o = [_affine(_mm(x2, wu[r, s], F), aff[...], relu=True)
         .reshape(H, W, F).astype(_BF)
         for r in range(2) for s in range(2)]
    return _interleave2(*o)


def _hourglass_body(x, refs, projs):
    """BasicBlock(front) + ResBlock + EncoderDecoder (blocks.py:91-119).
    x: (H, W, Cin) bf16 -> (H, W, c0) bf16. If the deepest level's width
    (W/4) is not a multiple of 8 (BEV 80 -> 20), it is zero-padded to one
    and every level-2 op re-zeroes the pad cols — exactly SAME-conv
    semantics, since a SAME conv at width 20 also taps zeros past col 19."""
    pi = iter(projs)
    w_f, a_f = refs.pop(0), refs.pop(0)
    x = _front_conv(x, w_f, a_f[...], kh=7).astype(_BF)
    x = _resblock(x, refs, next(pi))                 # front res (c0)

    skip1 = _resblock(x, refs, next(pi))             # (H, W, c0)
    x = _pool2(x)
    x = _resblock(x, refs, next(pi))                 # c1

    skip2 = _resblock(x, refs, next(pi))             # (H/2, W/2, c1)
    x = _pool2(x)
    w2 = x.shape[1]
    pad2 = (-w2) % 8
    vw = w2 if pad2 else None
    if pad2:
        x = jnp.pad(x, ((0, 0), (0, pad2), (0, 0)))
    x = _resblock(x, refs, next(pi), valid_w=vw)     # c2
    x = _resblock(x, refs, next(pi), valid_w=vw)
    x = _resblock(x, refs, next(pi), valid_w=vw)

    x = _upsample(x, refs)                           # c2 -> c1, 2x
    x = x[:, :skip2.shape[1]]
    x = (x.astype(jnp.float32) + skip2).astype(_BF)
    x = _resblock(x, refs, next(pi))
    x = _upsample(x, refs)                           # c1 -> c0, 2x
    return (x.astype(jnp.float32) + skip1).astype(_BF)


# ---------------------------------------------------------------------------
# P2PNet
# ---------------------------------------------------------------------------

def _p2p_kernel(*refs, projs, H, W, J):
    x_ref = refs[0]
    out_ref = refs[-1]
    body = list(refs[1:-3])
    wf, bf = refs[-3], refs[-2]

    x = x_ref[0].astype(_BF)
    x = _hourglass_body(x, body, projs)
    h = _mm(x.reshape(H * W, x.shape[-1]), wf[...], J) + bf[0]
    out_ref[0] = h.reshape(H, W, J)


def hourglass_supported(shape) -> bool:
    """The kernel's (H, W, C) -> (H*W, C) merges need W % 8 == 0 at levels
    0 and 1 (level 2 is zero-padded + masked when needed)."""
    H, W = shape[-3], shape[-2]
    return (H % 16 == 0 and W % 16 == 0 and W >= 32 and H >= 32
            and (W // 2) % 8 == 0)


@functools.partial(jax.jit, static_argnames=("projs", "interpret"))
def _p2p_call(planes, weights, final_w, final_b, projs,
              interpret: bool = False):
    N, H, W, J = planes.shape
    n_in = 1 + len(weights) + 2
    specs = [pl.BlockSpec((1, H, W, J), lambda n: (n, 0, 0, 0),
                          memory_space=pltpu.VMEM)]
    for w in weights:
        specs.append(pl.BlockSpec(
            w.shape, (lambda n, _nd=w.ndim: (0,) * _nd),
            memory_space=pltpu.VMEM))
    specs.append(pl.BlockSpec(final_w.shape, lambda n: (0, 0),
                              memory_space=pltpu.VMEM))
    specs.append(pl.BlockSpec(final_b.shape, lambda n: (0, 0),
                              memory_space=pltpu.VMEM))

    kernel = functools.partial(_p2p_kernel, projs=projs, H=H, W=W, J=J)
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, H, W, J), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, J), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # the default 16 MB scoped-vmem budget undercounts liveness
            # reuse across the ~30-layer body; v5e VMEM comfortably holds
            # the true ~8 MB working set plus double buffers
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(planes.astype(_BF), *weights, final_w, final_b)


# ---------------------------------------------------------------------------
# CenterNet (BEV heads): body + two conv3-relu-conv1 heads, one launch
# ---------------------------------------------------------------------------

def _centernet_kernel(*refs, projs, H, W):
    x_ref = refs[0]
    hm_ref, size_ref = refs[-2], refs[-1]
    ins = list(refs[1:-2])
    head = ins[-8:]                # wh0 ah0 wh1 bh1 ws0 as0 ws1 bs1
    body = ins[:-8]

    x = x_ref[0].astype(_BF)
    x = _hourglass_body(x, body, projs)              # (H, W, c0)

    wh0, ah0, wh1, bh1, ws0, as0, ws1, bs1 = head
    h = _conv3(x, wh0, ah0[...], relu=True).astype(_BF)
    hm = _mm(h.reshape(H * W, -1), wh1[...], 1) + bh1[0]
    hm_ref[0] = hm.reshape(H, W, 1)

    s = _conv3(x, ws0, as0[...], relu=True).astype(_BF)
    size = _mm(s.reshape(H * W, -1), ws1[...], 2) + bs1[0]
    size_ref[0] = size.reshape(H, W, 2)


def pack_centernet(variables) -> dict:
    """CenterNet serving weights as one array pytree. Computed ONCE at
    model load (engine/packing.py) and carried in a 'packed' variable
    collection, instead of re-deriving ~40 tiny XLA packing ops inside
    every jitted forward (the per-call cost that made fused C2C/P2P lose
    their A/Bs in round 3 — docs/PERFORMANCE.md)."""
    weights, _ = pack_hourglass_params(variables)
    params, stats = variables["params"], variables["batch_stats"]
    # heads: hm = Conv_0 (3x3 -> head_conv) + relu + Conv_1 (1x1 -> 1 f32),
    # size = Conv_2 + relu + Conv_3 (models/cnns.py CenterNet)
    head = [
        _conv_w(params, "Conv_0").reshape(9, -1,
                params["Conv_0"]["kernel"].shape[-1]).astype(_BF),
        _fold(params, stats, "Conv_0", None),
        _conv_w(params, "Conv_1")[0, 0].astype(_BF),
        params["Conv_1"]["bias"].reshape(1, -1).astype(jnp.float32),
        _conv_w(params, "Conv_2").reshape(9, -1,
                params["Conv_2"]["kernel"].shape[-1]).astype(_BF),
        _fold(params, stats, "Conv_2", None),
        _conv_w(params, "Conv_3")[0, 0].astype(_BF),
        params["Conv_3"]["bias"].reshape(1, -1).astype(jnp.float32),
    ]
    return {"body": tuple(weights), "head": tuple(head)}


def pallas_centernet(variables, bev: jax.Array, interpret: bool = False,
                     packed: dict | None = None):
    """Fused CenterNet forward (inference). variables: the flax CenterNet
    variable tree; bev: (B, X, Y, J) z-collapsed volume. Returns
    (hm (B, X, Y, 1), size (B, X, Y, 2)) f32 — matches
    CenterNet.apply(...) after its own max over z.

    At B=1 serving shape the XLA module pays ~30 kernel launches on idle
    hardware (~0.8 ms for ~1.5 GFLOP); this runs the whole net (heads
    included) as one launch. `packed`: optional pre-packed weights
    (pack_centernet) hoisted to model load."""
    if packed is None:
        packed = pack_centernet(variables)
    projs = hourglass_projs(variables["params"])
    return _centernet_call(bev.astype(_BF), tuple(packed["body"]),
                           tuple(packed["head"]), projs,
                           interpret=interpret)


@functools.partial(jax.jit, static_argnames=("projs", "interpret"))
def _centernet_call(bev, weights, head, projs, interpret: bool = False):
    B, H, W, J = bev.shape
    specs = [pl.BlockSpec((1, H, W, J), lambda n: (n, 0, 0, 0),
                          memory_space=pltpu.VMEM)]
    for w in list(weights) + list(head):
        specs.append(pl.BlockSpec(
            w.shape, (lambda n, _nd=w.ndim: (0,) * _nd),
            memory_space=pltpu.VMEM))

    kernel = functools.partial(_centernet_kernel, projs=projs, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, H, W, 1), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, 2), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W, 2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(bev, *weights, *head)


# ---------------------------------------------------------------------------
# C2CNet (1D z-column net): all items batched on the SUBLANE dim, every
# conv shift/pool/interleave on the LEADING (z) dim — no relayouts at all
# ---------------------------------------------------------------------------

def _conv1(x, w_ref, aff, relu: bool):
    """k-tap 1D SAME conv. x: (Z, Np, Cin) bf16 (z leading, items on
    sublanes); w_ref: (k, Cin, F)."""
    Z, Np, Cin = x.shape
    k = w_ref.shape[0]
    F = w_ref.shape[-1]
    p = k // 2
    xp = jnp.pad(x, ((p, p), (0, 0), (0, 0)))
    acc = jnp.zeros((Z * Np, F), jnp.float32)
    for t in range(k):
        acc = acc + _mm(xp[t:t + Z].reshape(Z * Np, Cin), w_ref[t], F)
    return _affine(acc, aff, relu).reshape(Z, Np, F)


def _res1d(x, refs, proj: bool):
    w0, a0 = refs.pop(0), refs.pop(0)
    w1, a1 = refs.pop(0), refs.pop(0)
    h = _conv1(x, w0, a0[...], relu=True).astype(_BF)
    Z, Np, _ = h.shape
    F = w1.shape[-1]
    h2 = _conv1(h, w1, a1[...], relu=False)
    if proj:
        wp, ap = refs.pop(0), refs.pop(0)
        skip = _affine(_mm(x.reshape(Z * Np, -1), wp[0], F), ap[...],
                       relu=False).reshape(Z, Np, F)
    else:
        skip = x.astype(jnp.float32)
    return jnp.maximum(h2 + skip, 0.0).astype(_BF)


def _up1d(x, refs):
    wu, aff = refs.pop(0), refs.pop(0)
    Z, Np, Cin = x.shape
    F = wu.shape[-1]
    x2 = x.reshape(Z * Np, Cin)
    o = [_affine(_mm(x2, wu[r], F), aff[...], relu=True)
         .reshape(Z, Np, F).astype(_BF) for r in range(2)]
    return jnp.stack(o, axis=1).reshape(2 * Z, Np, F)


def _c2c_kernel(*refs, projs):
    x_ref = refs[0]
    out_ref = refs[-1]
    body = list(refs[1:-3])
    wf, bf = refs[-3], refs[-2]

    x = x_ref[...].astype(_BF)                       # (Z, Np, J)
    pi = iter(projs)
    w_f, a_f = body.pop(0), body.pop(0)
    x = _conv1(x, w_f, a_f[...], relu=True).astype(_BF)   # front k=7
    x = _res1d(x, body, next(pi))

    skip1 = _res1d(x, body, next(pi))
    x = jnp.max(x.reshape(x.shape[0] // 2, 2, *x.shape[1:]), axis=1)
    x = _res1d(x, body, next(pi))

    skip2 = _res1d(x, body, next(pi))
    x = jnp.max(x.reshape(x.shape[0] // 2, 2, *x.shape[1:]), axis=1)
    x = _res1d(x, body, next(pi))
    x = _res1d(x, body, next(pi))
    x = _res1d(x, body, next(pi))

    x = _up1d(x, body)
    x = (x.astype(jnp.float32) + skip2).astype(_BF)
    x = _res1d(x, body, next(pi))
    x = _up1d(x, body)
    x = (x.astype(jnp.float32) + skip1).astype(_BF)

    Z, Np, C = x.shape
    h = _mm(x.reshape(Z * Np, C), wf[0], 1) + bf[0]       # final 1x1, f32
    out_ref[...] = jnp.broadcast_to(h.reshape(Z, Np, 1), (Z, Np, 8)
                                    ).astype(out_ref.dtype)


def _pack_1d(variables):
    """C2CNet body weights in apply order (1D kernels keep their native
    (k, Cin, F) per-tap layout)."""
    params, stats = variables["params"], variables["batch_stats"]
    out: list = []
    projs: list = []

    out.append(params["BasicBlock_0"]["Conv_0"]["kernel"].astype(_BF))
    out.append(_fold(params["BasicBlock_0"], stats["BasicBlock_0"],
                     "Conv_0", "BatchNorm_0"))

    def res(p, s):
        proj = "Conv_2" in p
        out.append(p["Conv_0"]["kernel"].astype(_BF))
        out.append(_fold(p, s, "Conv_0", "BatchNorm_0"))
        out.append(p["Conv_1"]["kernel"].astype(_BF))
        out.append(_fold(p, s, "Conv_1", "BatchNorm_1"))
        if proj:
            out.append(p["Conv_2"]["kernel"].astype(_BF))
            out.append(_fold(p, s, "Conv_2", "BatchNorm_2"))
        projs.append(proj)

    res(params["ResBlock_0"], stats["ResBlock_0"])
    enc_p, enc_s = params["EncoderDecoder_0"], stats["EncoderDecoder_0"]
    for rb in ("ResBlock_0", "ResBlock_1", "ResBlock_2", "ResBlock_3",
               "ResBlock_4", "ResBlock_5"):
        res(enc_p[rb], enc_s[rb])
    for ub, rb in (("UpsampleBlock_0", "ResBlock_6"),
                   ("UpsampleBlock_1", None)):
        k = enc_p[ub]["ConvTranspose_0"]["kernel"]       # (2, Cin, F)
        out.append(k[::-1].astype(_BF))                  # wu[r] = kf[1-r]
        p, s = enc_p[ub]["BatchNorm_0"], enc_s[ub]["BatchNorm_0"]
        aff = bn_affine(p["scale"], p["bias"], s["mean"], s["var"])
        cb = enc_p[ub]["ConvTranspose_0"]["bias"]        # see blocks.py
        out.append(jnp.stack([aff[0], aff[0] * cb + aff[1]]
                             ).astype(jnp.float32))
        if rb:
            res(enc_p[rb], enc_s[rb])
    return out, tuple(projs)


def pack_c2cnet(variables) -> dict:
    """C2CNet serving weights as one array pytree (see pack_centernet)."""
    weights, _ = _pack_1d(variables)
    params = variables["params"]
    wf = params["Conv_0"]["kernel"].astype(_BF)          # (1, c0, 1)
    bf = params["Conv_0"]["bias"].reshape(1, 1).astype(jnp.float32)
    return {"body": tuple(weights), "wf": wf, "bf": bf}


def pallas_c2cnet(variables, cols: jax.Array,
                  interpret: bool = False,
                  packed: dict | None = None) -> jax.Array:
    """Fused C2CNet forward (inference). variables: the flax C2CNet
    variable tree; cols: (N, Z, J) proposal z-columns. Returns (N, Z) f32
    height heatmaps — matches C2CNet.apply(..., train=False).

    Layout: ONE grid step; items ride the sublane dim (padded to 8), z is
    the leading dim, so every tap shift, pool and upsample interleave is a
    free leading-dim move. `packed`: optional pre-packed weights
    (pack_c2cnet) hoisted to model load."""
    N, Z, J = cols.shape
    Np = (N + 7) // 8 * 8
    x = jnp.pad(cols, ((0, Np - N), (0, 0), (0, 0)))
    x = x.transpose(1, 0, 2).astype(_BF)                 # (Z, Np, J)

    if packed is None:
        packed = pack_c2cnet(variables)
    projs = hourglass_projs(variables["params"])
    out = _c2c_call(x, tuple(packed["body"]), packed["wf"], packed["bf"],
                    projs, interpret=interpret)
    return out[:, :N, 0].transpose(1, 0)                 # (N, Z)


@functools.partial(jax.jit, static_argnames=("projs", "interpret"))
def _c2c_call(x, weights, wf, bf, projs, interpret: bool = False):
    Z, Np, J = x.shape
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    for w in list(weights) + [wf, bf]:
        specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    kernel = functools.partial(_c2c_kernel, projs=projs)
    return pl.pallas_call(
        kernel,
        in_specs=specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z, Np, 8), jnp.float32),
        interpret=interpret,
    )(x, *weights, wf, bf)


def pack_p2pnet(variables) -> dict:
    """P2PNet serving weights as one array pytree (see pack_centernet)."""
    weights, _ = pack_hourglass_params(variables)
    params = variables["params"]
    final_w = params["Conv_0"]["kernel"][0, 0].astype(_BF)   # (c0, J)
    final_b = params["Conv_0"]["bias"].reshape(1, -1).astype(jnp.float32)
    return {"body": tuple(weights), "final_w": final_w, "final_b": final_b}


def pallas_p2pnet(variables, planes: jax.Array, num_joints: int,
                  interpret: bool = False,
                  packed: dict | None = None) -> jax.Array:
    """Fused P2PNet forward (inference). variables: the flax P2PNet
    variable tree ({'params', 'batch_stats'}); planes: (N, A, B, J).
    Returns (N, A, B, J) f32 — matches P2PNet.apply(..., train=False).
    `packed`: optional pre-packed weights (pack_p2pnet) hoisted to model
    load."""
    if packed is None:
        packed = pack_p2pnet(variables)
    projs = hourglass_projs(variables["params"])
    return _p2p_call(planes, tuple(packed["body"]), packed["final_w"],
                     packed["final_b"], projs, interpret=interpret)
