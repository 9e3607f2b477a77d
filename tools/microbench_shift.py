#!/usr/bin/env python
"""How much does a sublane shift-by-1 really cost on this chip?

Every conv-ish Pallas kernel here keeps activations as (M, C) with C on
lanes; a 3x3 conv tap at dx != 0 needs the buffer shifted by one ROW
element — an unaligned sublane move. Round-3 measured ad-hoc relayouts
at ~2 MB / 6 us (~330 GB/s), which priced the fused P2P/trunk kernels
out. This microbench isolates the candidates inside one kernel:

  a) baseline: aligned slice (offset 0) + matmul
  b) unaligned value slice (offset 1) + matmul      [the status-quo tax]
  c) pltpu.roll on the sublane axis + matmul
  d) offset-8 slice (tile-aligned) + matmul         [should match (a)]

Each variant runs the same (M, C) @ (C, C) matmul so the delta is pure
data-movement. Usage: python tools/microbench_shift.py [--iters 50]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--m", type=int, default=65536)
    ap.add_argument("--c", type=int, default=64)
    args = ap.parse_args()

    import jax
    if os.environ.get("FVP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["FVP_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = jax.default_backend() != "tpu"
    M, C = args.m, args.c
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(M + 8, C).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray(rng.rand(C, C).astype(np.float32)).astype(jnp.bfloat16)

    def make(variant):
        def kernel(x_ref, w_ref, o_ref):
            xv = x_ref[...]
            if variant == "aligned":
                t = xv[0:M]
            elif variant == "unaligned1":
                t = xv[1:M + 1]
            elif variant == "roll":
                t = pltpu.roll(xv, 1, 0)[0:M]
            elif variant == "offset8":
                t = xv[8:M + 8]
            o_ref[...] = jax.lax.dot_general(
                t, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, C), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp)
        return jax.jit(fn)

    def timeit(fn, *a, iters=args.iters):
        def fence(out):
            return float(jnp.asarray(out).ravel()[0])
        for _ in range(3):
            fence(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        fence(out)
        return (time.perf_counter() - t0) / iters * 1e6

    mb = M * C * 2 / 1e6
    for variant in ("aligned", "unaligned1", "roll", "offset8"):
        try:
            t = timeit(make(variant), x, w)
            print(f"{variant:11s}: {t:8.2f} us  "
                  f"({mb / t * 1e3:7.1f} GB/s equiv on {mb:.1f} MB)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — report which variant fails
            print(f"{variant:11s}: FAILED {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
