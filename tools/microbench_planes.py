#!/usr/bin/env python
"""Same-run A/B: person-plane sampler v1 (sampler + collapse, two
launches) vs v2 (fused single-launch sample+collapse,
ops/pallas/sampler.py::pallas_tiled_sample_project_collapse) at the
flagship serving shape, plus a bitwise parity check on-chip.

Usage: python tools/microbench_planes.py [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def timeit(fn, *args, iters=30, warmup=3):
    def fence(out):
        return float(jnp.asarray(out[0]).ravel()[0])

    for _ in range(warmup):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from __graft_entry__ import _panoptic_rig
    from fvp_tpu.config import FVPConfig
    from fvp_tpu.geometry.grids import build_rig_constants
    from fvp_tpu.ops.fast_sampling import sample_person_planes_pallas_batched

    cfg = FVPConfig(compute_dtype="bfloat16")
    rig = _panoptic_rig(cfg.num_views, cfg)
    rc = jax.tree_util.tree_map(jnp.asarray, build_rig_constants(cfg, rig))
    rng = np.random.RandomState(0)
    w, h = cfg.heatmap_size
    B, K = 1, cfg.max_people
    hm = jnp.asarray(rng.rand(B, cfg.num_views, cfg.num_joints, h, w)
                     .astype(np.float32))
    centers = jnp.asarray(np.stack([
        rng.uniform(-3000, 3000, (B, K)),
        rng.uniform(-3500, 2500, (B, K)),
        rng.uniform(400, 1400, (B, K)),
    ], -1).astype(np.float32))
    bbox = jnp.asarray(rng.uniform(0.3, 0.9, (B, K, 2)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, K), bool))

    v1 = jax.jit(lambda h, r, c, b: sample_person_planes_pallas_batched(
        h, r, cfg, c, b, person_mask=mask,
        band_height=cfg.jln_band_height))
    v2 = jax.jit(lambda h, r, c, b: sample_person_planes_pallas_batched(
        h, r, cfg, c, b, person_mask=mask,
        band_height=cfg.jln_band_height, fused=True))

    p1, o1 = v1(hm, rc, centers, bbox)
    p2, o2 = v2(hm, rc, centers, bbox)
    bitwise = bool(jnp.all(p1 == p2)) and bool(jnp.all(o1 == o2))
    print(f"bitwise parity: {bitwise}")
    if not bitwise:
        print(f"  max |delta| {float(jnp.max(jnp.abs(p1 - p2))):.3e}")

    t1 = timeit(v1, hm, rc, centers, bbox, iters=args.iters)
    t2 = timeit(v2, hm, rc, centers, bbox, iters=args.iters)
    print(f"v1 (sampler + collapse): {t1:.3f} ms")
    print(f"v2 (fused):              {t2:.3f} ms   ({t1 / t2:.2f}x)")


if __name__ == "__main__":
    main()
