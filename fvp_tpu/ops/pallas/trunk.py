"""Pallas TPU kernel: fused stride-1 ResNet bottleneck stage (layer1).

Motivation: tools/microbench_trunk.py measures layer1 (3 bottlenecks at
(5, 128, 240) spatial, 64/256 channels) at **12-14% MFU** under XLA — the
worst stage of the backbone trunk (small channel counts against a big
spatial extent; reference op lib/models/resnet.py:40-64). This kernel
runs the whole stage as one launch per (view, row-block) with all stage
weights VMEM-resident and NO HBM round-trips between the nine convs.

MEASURED LOSS on v5e (same-run, 2026-08-20): XLA layer1 2.36 ms vs this
kernel 2.78 ms (R=32/64). The three per-bottleneck unaligned relayout
copies (h9/h10 tap classes + the y realign) move FULL 128-lane tiles
even at C=64 — twice the logical bytes — and the 9-tap matmuls contract
only 64 of 128 lanes, so the kernel's floor lands right at XLA's level:
layer1's low MFU is a shape-imposed floor on this hardware, not XLA
inefficiency. Kept in-tree with its parity tests as the measured record
(same convention as the fused-P2P/s2d losses, docs/PERFORMANCE.md);
NOT wired into PoseResNet.

Formulation (v5e cost model, NOTES_ROUND3.md: leading/sublane-ALIGNED
slices are free; any unaligned sublane shift is a ~300 GB/s relayout
copy; Mosaic has no strided slices):

* Activations stay FLAT (rows = row*Wp + col, C on lanes) with the W axis
  zero-padded to Wp = W + 8 (multiple of 8), so a conv tap (dy, dx) of
  the whole block is ONE slice at offset dy*Wp + (dx + 8) — dy rides
  aligned offsets, and the three dx residue classes {8, 9, 10} are
  served by two explicit shifted copies (h9, h10) + the aligned h
  itself: exactly 2 relayout copies per 3x3 conv, at the cheap C=64
  width, instead of 9.
* The 3x3 conv is 9 accumulated (M, 64) @ (64, 64) MXU matmuls (per-tap
  weights); 1x1 convs and the block-1 downsample are plain matmuls; BN
  is pre-folded (inference); ReLU/affine/masks run on the VPU.
* Each bottleneck's conv2 output lands at flat offset Wp + 9 relative to
  its input; one unaligned realign slice (C=64, before the widening
  conv3) restores row-grid alignment, so the residual slice (2*Wp) and
  every other slice in the chain stay 8-aligned.
* SAME-pad semantics are preserved exactly: a combined row/col validity
  mask zeroes the pad columns and out-of-image halo rows after each
  bottleneck, so the next conv's taps read true zeros (XLA pads fresh
  zeros at every conv; without the mask the folded-BN bias would bleed
  through the halo).

Per-bottleneck geometry: output starts 2 rows below the input and the
buffer shrinks by ~3 rows; a 3-block stage therefore needs 6 halo rows
above and 3 below, which the XLA-side pad provides. Inference-only
(folded BN running stats); training keeps the XLA modules. Weights are
packed once at model load (engine/packing.py 'packed' collection).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BF = jnp.bfloat16
PADL = 4          # zero columns left/right: Wp = W + 8


def _fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    a = scale / jnp.sqrt(var + eps)
    return jnp.stack([a, bias - a * mean]).astype(jnp.float32)


def pack_bottleneck_stage(params, stats, blocks: tuple) -> dict:
    """Stage weights -> flat array pytree. params/stats keyed by block
    name (e.g. 'layer1_0') with conv1/bn1/conv2/bn2/conv3/bn3
    [+ down_conv/down_bn] (models/resnet.py Bottleneck). conv2 is stored
    (9, Cmid, Cmid) per-tap."""
    out = []
    for name in blocks:
        p, s = params[name], stats[name]

        def aff(bn, p=p, s=s):
            # models/resnet.py _BN wraps nn.BatchNorm in its own scope
            pb, sb = p[bn]["BatchNorm_0"], s[bn]["BatchNorm_0"]
            return _fold_bn(pb["scale"], pb["bias"],
                            sb["mean"], sb["var"])

        out.append(p["conv1"]["kernel"][0, 0].astype(_BF))
        out.append(aff("bn1"))
        k2 = p["conv2"]["kernel"]                        # (3, 3, Cm, Cm)
        out.append(k2.reshape(9, *k2.shape[2:]).astype(_BF))
        out.append(aff("bn2"))
        out.append(p["conv3"]["kernel"][0, 0].astype(_BF))
        out.append(aff("bn3"))
        if "down_conv" in p:
            out.append(p["down_conv"]["kernel"][0, 0].astype(_BF))
            out.append(aff("down_bn"))
    return {"weights": tuple(out)}


def _mm(x, w):
    return jax.lax.dot_general(
        x.astype(w.dtype), w, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _stage_kernel(x_ref, *refs, R, W, downs, H, halo_top):
    """Grid (V, H // R). x_ref: (1, (H + halo) * Wp, Cin); out_ref block
    (1, R * Wp, Cout). Block b consumes padded rows
    [b*R, b*R + R + halo) (the pad already offsets by halo_top)."""
    out_ref = refs[-1]
    wrefs = refs[:-1]
    Wp = W + 2 * PADL
    n = len(downs)
    L0 = (R + halo_top + 4) * Wp        # rows this block reads
    r = pl.program_id(1)

    x = x_ref[0, pl.ds(r * R * Wp, L0), :]               # aligned (R*Wp)
    # absolute padded-row index of x[0] (for the halo-row mask)
    row0 = r * R                         # in padded coords (pad row 0 = image row -halo_top)

    wi = 0

    def nxt():
        nonlocal wi
        v = wrefs[wi][...]
        wi += 1
        return v

    L = L0
    off = 0                              # rows consumed above (alignment)
    for b in range(n):
        w1, a1 = nxt(), nxt()
        w2, a2 = nxt(), nxt()
        w3, a3 = nxt(), nxt()
        if downs[b]:
            wd, ad = nxt(), nxt()
            res = (_mm(x, wd) * ad[0] + ad[1]).astype(_BF)
        else:
            res = x

        h = jnp.maximum(_mm(x, w1) * a1[0] + a1[1], 0.0)
        # validity mask: pad columns AND out-of-image halo rows -> 0
        # (restores XLA's fresh zero padding before the 3x3 taps)
        idx = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
        col = idx % Wp
        prow = idx // Wp + (row0 + off)                  # padded row id
        img_row = prow - halo_top
        valid = ((col >= PADL) & (col < PADL + W)
                 & (img_row >= 0) & (img_row < H))
        h = jnp.where(valid, h, 0.0).astype(_BF)

        # 3x3: out at flat p = j + Wp + 9 taps h[j + dy*Wp + dx + 8]
        inner = L - 2 * Wp - 16
        h9 = h[9:]                                        # relayout copy
        h10 = h[10:]                                      # relayout copy
        acc = jnp.zeros((inner, w2.shape[-1]), jnp.float32)
        for dy in range(3):
            acc = acc + _mm(h[dy * Wp + 8:dy * Wp + 8 + inner], w2[dy * 3])
            acc = acc + _mm(h9[dy * Wp:dy * Wp + inner], w2[dy * 3 + 1])
            acc = acc + _mm(h10[dy * Wp:dy * Wp + inner], w2[dy * 3 + 2])
        y = jnp.maximum(acc * a2[0] + a2[1], 0.0).astype(_BF)
        # y[j] is at input-flat Wp + 9 + j; realign to 2*Wp (one cheap
        # C=64 unaligned slice) so the residual slice stays aligned
        m = inner - (Wp - 9)
        y_al = y[Wp - 9:Wp - 9 + m]                       # relayout copy

        h3 = _mm(y_al, w3) * a3[0] + a3[1]
        resr = res[2 * Wp:2 * Wp + m]                     # aligned
        x = jnp.maximum(h3 + resr.astype(jnp.float32), 0.0).astype(_BF)
        off += 2
        L = m

    out_ref[0] = x[:R * Wp].astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("blocks_cfg", "R", "interpret"))
def pallas_bottleneck_stage(x: jax.Array, packed: dict, blocks_cfg: tuple,
                            R: int = 32,
                            interpret: bool = False) -> jax.Array:
    """x: (V, H, W, Cin); packed: pack_bottleneck_stage output;
    blocks_cfg: tuple of (cmid, down) per block. Returns (V, H, W, 4*cmid)
    bf16 == the stride-1 Bottleneck chain at inference (folded BN)."""
    V, H, W, Cin = x.shape
    n = len(blocks_cfg)
    downs = tuple(d for _, d in blocks_cfg)
    cout = 4 * blocks_cfg[-1][0]
    Wp = W + 2 * PADL
    halo_top = 2 * n                     # rows consumed above the output
    halo_bot = n + 2                     # slack below (taps + realign);
    # the kernel reads (R + halo_top + 4) rows per block, so the last
    # block needs halo_bot >= 4 below the image — n + 2 >= 4 for n >= 2
    assert H % R == 0, (H, R)

    xp = jnp.pad(x, ((0, 0), (halo_top, halo_bot), (PADL, PADL), (0, 0))
                 ).astype(_BF)
    xf = xp.reshape(V, (H + halo_top + halo_bot) * Wp, Cin)

    kernel = functools.partial(_stage_kernel, R=R, W=W, downs=downs, H=H,
                               halo_top=halo_top)
    wspecs = [
        pl.BlockSpec(w.shape, lambda v, r, nd=w.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for w in packed["weights"]
    ]
    out = pl.pallas_call(
        kernel,
        grid=(V, H // R),
        in_specs=[pl.BlockSpec(
            (1, (H + halo_top + halo_bot) * Wp, Cin),
            lambda v, r: (v, 0, 0), memory_space=pltpu.VMEM)] + wspecs,
        out_specs=pl.BlockSpec((1, R * Wp, cout), lambda v, r: (v, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, (H // R) * R * Wp, cout), _BF),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xf, *packed["weights"])
    return out.reshape(V, H, Wp, cout)[:, :, PADL:PADL + W, :]
