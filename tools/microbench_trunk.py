#!/usr/bin/env python
"""Backbone trunk stage microbench: where do the ~5 ms of ResNet-50 go?

Times each layer group standalone at the flagship serving shape
(5 views, 960x512 -> stem (5, 128, 240, 64)), reports ms / GFLOP / MFU
(v5e bf16 peak ~197 TF/s), plus the full trunk in one jit. Decides where
a Pallas lowering could pay (NOTES_ROUND3 lever 2 / VERDICT r3 item 4).

Usage: python tools/microbench_trunk.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK = 197e12   # v5e bf16 FLOP/s


def log(msg):
    print(msg, flush=True)


def timeit(fn, *args, iters=30, warmup=3):
    import jax.numpy as jnp

    def fence(out):
        return float(jnp.asarray(out).ravel()[0])

    for _ in range(warmup):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def conv_gflops(h, w, cin, cout, k=1, stride=1):
    return 2.0 * (h // stride) * (w // stride) * cin * cout * k * k / 1e9


def bottleneck_gflops(h, w, cin, cmid, stride, down):
    g = conv_gflops(h, w, cin, cmid)
    g += conv_gflops(h, w, cmid, cmid, 3, stride)
    g += conv_gflops(h // stride, w // stride, cmid, cmid * 4)
    if down:
        g += conv_gflops(h, w, cin, cmid * 4, 1, stride)
    return g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    if os.environ.get("FVP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["FVP_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from fvp_tpu.models.resnet import Bottleneck

    rng = np.random.RandomState(0)
    V = 5
    key = jax.random.PRNGKey(0)

    class Stage:
        def __init__(self, name, cin, cmid, blocks, stride, h, w):
            self.name, self.cin, self.cmid = name, cin, cmid
            self.blocks, self.stride, self.h, self.w = blocks, stride, h, w

        def build(self):
            import flax.linen as nn

            cmid, blocks, stride = self.cmid, self.blocks, self.stride
            cin = self.cin

            class M(nn.Module):
                @nn.compact
                def __call__(self, x):
                    for bi in range(blocks):
                        down = bi == 0 and (stride != 1 or cin != cmid * 4)
                        x = Bottleneck(cmid, stride if bi == 0 else 1,
                                       down, dtype=jnp.bfloat16)(x, False)
                    return x

            return M()

        def gflops(self):
            g = bottleneck_gflops(self.h, self.w, self.cin, self.cmid,
                                  self.stride, True)
            for _ in range(self.blocks - 1):
                g += bottleneck_gflops(self.h // self.stride,
                                       self.w // self.stride,
                                       self.cmid * 4, self.cmid, 1, False)
            return g * V

    stages = [
        Stage("layer1", 64, 64, 3, 1, 128, 240),
        Stage("layer2", 256, 128, 4, 2, 128, 240),
        Stage("layer3", 512, 256, 6, 2, 64, 120),
        Stage("layer4", 1024, 512, 3, 2, 32, 60),
    ]
    total_ms = 0.0
    for st in stages:
        x = jnp.asarray(rng.rand(V, st.h, st.w, st.cin)
                        .astype(np.float32)).astype(jnp.bfloat16)
        m = st.build()
        v = m.init(key, x)
        t = timeit(jax.jit(lambda xx: m.apply(v, xx)), x,
                   iters=args.iters) * 1000
        g = st.gflops()
        total_ms += t
        log(f"{st.name}: {t:7.3f} ms  {g:6.1f} GF  "
            f"MFU {g / (t / 1000) / 1e3 / (PEAK / 1e12):5.1%}")

        if st.name == "layer1":
            # same-run A/B: the fused Pallas stage (ops/pallas/trunk.py)
            from fvp_tpu.ops.pallas.trunk import (
                pack_bottleneck_stage, pallas_bottleneck_stage,
            )

            names = tuple(f"layer1_{i}" for i in range(st.blocks))
            # _Stage block names are Bottleneck_0.. under the local module
            p = {f"layer1_{i}": v["params"][f"Bottleneck_{i}"]
                 for i in range(st.blocks)}
            s = {f"layer1_{i}": v["batch_stats"][f"Bottleneck_{i}"]
                 for i in range(st.blocks)}
            packed = pack_bottleneck_stage(p, s, names)
            cfg_blocks = tuple((st.cmid, i == 0)
                               for i in range(st.blocks))
            interp = jax.default_backend() != "tpu"
            for R in (16, 32, 64):
                try:
                    tp = timeit(jax.jit(
                        lambda xx, R=R: pallas_bottleneck_stage(
                            xx, packed, cfg_blocks, R=R,
                            interpret=interp)), x,
                        iters=args.iters) * 1000
                    log(f"  pallas layer1 (R={R}): {tp:7.3f} ms  "
                        f"MFU {g / (tp / 1000) / 1e3 / (PEAK / 1e12):5.1%}")
                except Exception as e:  # noqa: BLE001
                    log(f"  pallas layer1 (R={R}): FAILED "
                        f"{type(e).__name__}: "
                        f"{str(e).splitlines()[0][:110]}")
    log(f"trunk stages total: {total_ms:.3f} ms")


if __name__ == "__main__":
    main()
