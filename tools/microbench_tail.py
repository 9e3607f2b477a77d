#!/usr/bin/env python
"""Microbenchmark: conv-tail modules + stem input-layout candidates.

Round-2 profiling attributes ~4 ms of the 12.6 ms e2e to the conv tail
(CenterNet + C2CNet + P2PNet + WeightNet — dozens of small convs at
15-128 channels on 80x80 / 64x64 / 20-z grids) and ~2.6 ms to the
backbone stem (7x7/s2 conv on a 3-channel image). This harness times

  - each tail module standalone at production shapes (batch 1, K=10),
  - the whole tail combined in one jit,
  - the stem conv as shipped (3-channel, stride 2) vs the HOST-side
    space-to-depth candidate: the data pipeline ships (H/2, W/2, 12) and
    the device runs a stride-1 4x4x12 conv with padding (2,1) — the
    same math as models/resnet.py::_S2DStem minus the device relayout
    that made the device-side rewrite a loss.

Usage: python tools/microbench_tail.py [--iters 50]
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

    from fvp_tpu.models.cnns import C2CNet, CenterNet, P2PNet, WeightNet

    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    # production shapes: Panoptic jln64, batch 1, K=10 proposals
    B, K, J, Z = 1, 10, 15, 20
    vol = jnp.asarray(rng.rand(B, 80, 80, Z, J).astype(np.float32))
    cols = jnp.asarray(rng.rand(B * K, Z, J).astype(np.float32))
    planes = jnp.asarray(rng.rand(3 * B * K, 64, 64, J).astype(np.float32))

    center = CenterNet(dtype=dt)
    c2c = C2CNet(dtype=dt)
    p2p = P2PNet(num_joints=J, dtype=dt)
    wnet = WeightNet(dtype=dt)
    cvars = center.init(key, vol, train=False)
    zvars = c2c.init(key, cols, train=False)
    pvars = p2p.init(key, planes, train=False)
    wvars = wnet.init(key, planes, train=False)

    def fence(o):
        return float(jnp.asarray(jax.tree_util.tree_leaves(o)[0])
                     .ravel()[0])

    def time_fn(fn, *a, iters=args.iters, warmup=3):
        for _ in range(warmup):
            fence(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*a)
        fence(o)
        return (time.perf_counter() - t0) / iters

    @jax.jit
    def f_center(v):
        return center.apply(cvars, v, train=False)

    @jax.jit
    def f_c2c(c):
        return c2c.apply(zvars, c, train=False)

    @jax.jit
    def f_p2p(p):
        return p2p.apply(pvars, p, train=False)

    @jax.jit
    def f_wnet(p):
        return wnet.apply(wvars, p, train=False)

    @jax.jit
    def f_tail(v, c, p):
        return (center.apply(cvars, v, train=False),
                c2c.apply(zvars, c, train=False),
                p2p.apply(pvars, p, train=False),
                wnet.apply(wvars, p, train=False))

    # --- stem candidates ---
    img = jnp.asarray(rng.rand(5, 512, 960, 3).astype(np.float32))
    kern = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05)
    # host-side s2d: what the data pipeline would ship
    img_np = np.asarray(img)
    s2d_np = img_np.reshape(5, 256, 2, 480, 2, 3).transpose(
        0, 1, 3, 2, 4, 5).reshape(5, 256, 480, 12)
    img_s2d = jnp.asarray(s2d_np)
    kp = np.zeros((8, 8, 3, 64), np.float32)
    kp[1:, 1:] = np.asarray(kern)
    k2 = jnp.asarray(kp.reshape(4, 2, 4, 2, 3, 64).transpose(
        0, 2, 1, 3, 4, 5).reshape(4, 4, 12, 64))

    @jax.jit
    def stem3(x):
        return jax.lax.conv_general_dilated(
            x.astype(dt), kern.astype(dt), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dt)

    @jax.jit
    def stem12(x):
        return jax.lax.conv_general_dilated(
            x.astype(dt), k2.astype(dt), (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dt)

    a = np.asarray(stem3(img).astype(jnp.float32))
    b = np.asarray(stem12(img_s2d).astype(jnp.float32))
    np.testing.assert_allclose(a, b, atol=2e-2)
    log("stem12(host-s2d input) matches stem3 (bf16 tolerance)")

    for name, f, fa in [
        ("CenterNet (1x80x80x20x15)", f_center, (vol,)),
        ("C2CNet (10x20x15)", f_c2c, (cols,)),
        ("P2PNet (30x64x64x15)", f_p2p, (planes,)),
        ("WeightNet (30x64x64x15)", f_wnet, (planes,)),
        ("tail combined", f_tail, (vol, cols, planes)),
        ("stem conv 7x7s2 3ch", stem3, (img,)),
        ("stem conv 4x4s1 12ch (host s2d)", stem12, (img_s2d,)),
    ]:
        t = time_fn(f, *fa)
        log(f"{name:>34}: {t * 1000:7.3f} ms")


if __name__ == "__main__":
    main()
