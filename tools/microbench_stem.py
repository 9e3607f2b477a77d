#!/usr/bin/env python
"""Microbenchmark: backbone stem-region formulations on the real chip.

The round-2 profiler trace shows the stem region (7x7/s2 conv + BN/ReLU +
3x3/s2 maxpool) costing ~1.6 ms/frame of the backbone's ~5.7 ms, over a
third of it in layout copies and a slow reduce_window. This harness times
isolated variants so layout experiments don't require full-bench runs:

  conv:    flax 7x7/s2 NHWC conv (the production stem)
  pool:    flax max_pool (reduce_window) on the stem output
  pool9:   maxpool as explicit 9-way strided-slice maximum
  pool33:  maxpool as separable 3x1 + 1x3 strided maxes
  stem+pool / stem+pool9: fused jits (lets XLA pick joint layouts)

Usage: python tools/microbench_stem.py [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    if os.environ.get("FVP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["FVP_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    import flax.linen as nn

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(5, 512, 960, 3).astype(np.float32))
    kern = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05)
    x64 = jnp.asarray(rng.rand(5, 256, 480, 64).astype(np.float32)).astype(dt)

    def fence(o):
        return float(jnp.asarray(o).ravel()[0])

    def time_fn(fn, *a, iters=args.iters, warmup=3):
        for _ in range(warmup):
            fence(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*a)
        fence(o)
        return (time.perf_counter() - t0) / iters

    @jax.jit
    def conv(x):
        return jax.lax.conv_general_dilated(
            x.astype(dt), kern.astype(dt), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dt)

    @jax.jit
    def pool(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))

    def pool9_impl(x):
        B, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=-jnp.inf)
        out = None
        for dy in range(3):
            for dx in range(3):
                v = jax.lax.slice(xp, (0, dy, dx, 0),
                                  (B, dy + H, dx + W, C), (1, 2, 2, 1))
                out = v if out is None else jnp.maximum(out, v)
        return out

    pool9 = jax.jit(pool9_impl)

    def pool33_impl(x):
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

    pool33 = jax.jit(pool33_impl)

    @jax.jit
    def stem_pool(x):
        return pool(jnp.maximum(conv(x), 0))

    @jax.jit
    def stem_pool9(x):
        return pool9_impl(jnp.maximum(conv(x), 0))

    @jax.jit
    def stem_pool33(x):
        return pool33_impl(jnp.maximum(conv(x), 0))

    # correctness pins
    a = np.asarray(pool(x64).astype(jnp.float32))
    for name, f in [("pool9", pool9), ("pool33", pool33)]:
        b = np.asarray(f(x64).astype(jnp.float32))
        np.testing.assert_allclose(a, b, atol=1e-6)
        log(f"{name}: matches reduce_window")

    for name, f, arg in [
        ("conv7x7s2", conv, img),
        ("pool(reduce_window)", pool, x64),
        ("pool9(slices)", pool9, x64),
        ("pool33(separable)", pool33, x64),
        ("stem+pool", stem_pool, img),
        ("stem+pool9", stem_pool9, img),
        ("stem+pool33", stem_pool33, img),
    ]:
        t = time_fn(f, arg)
        log(f"{name:>22}: {t * 1000:7.3f} ms")


if __name__ == "__main__":
    main()
