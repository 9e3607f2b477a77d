#!/usr/bin/env python
"""Separate per-call dispatch/link overhead from on-device compute.

Times the HDN+JLN pipeline (heatmap input, flagship shapes) two ways:
  a) N independent dispatches (the serving pattern; what bench.py times)
  b) ONE dispatch running N iterations inside a device-side lax.scan
The scan result is the pure on-device rate; the per-call delta is what
the tunneled runtime charges per dispatch. Diagnoses days when the
recorded fps sags: chip-state (both sag together) vs link-state (only
the dispatched number sags).

Usage: python tools/microbench_dispatch.py [--iters 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    if os.environ.get("FVP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["FVP_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from __graft_entry__ import _panoptic_rig
    from fvp_tpu.config import FVPConfig
    from fvp_tpu.engine.packing import pack_model_variables
    from fvp_tpu.geometry.grids import build_rig_constants
    from fvp_tpu.models.faster_voxelpose import FasterVoxelPose

    cfg = FVPConfig(compute_dtype="bfloat16")
    rig = _panoptic_rig(cfg.num_views, cfg)
    rc = jax.tree_util.tree_map(jnp.asarray, build_rig_constants(cfg, rig))
    model = FasterVoxelPose(cfg=cfg)
    hm_w, hm_h = cfg.heatmap_size
    rng = np.random.RandomState(0)
    hm = jnp.asarray(rng.rand(1, cfg.num_views, cfg.num_joints, hm_h, hm_w)
                     .astype(np.float32))
    variables = jax.jit(
        lambda k, s: model.init(k, s, rc, train=False)
    )(jax.random.PRNGKey(0), hm)
    variables = pack_model_variables(cfg, variables)

    @jax.jit
    def one(h):
        return model.apply(variables, h, rc, train=False)["fused_poses"]

    N = args.iters

    @jax.jit
    def looped(h):
        def body(carry, _):
            out = model.apply(variables, h + carry * 1e-6, rc,
                              train=False)["fused_poses"]
            # data-dependent carry so the loop can't be collapsed
            return jnp.sum(out[..., 4]), out
        s, outs = jax.lax.scan(body, 0.0, None, length=N)
        return s

    def fence(x):
        return float(jnp.asarray(x).ravel()[0])

    for _ in range(3):
        fence(one(hm))
    t0 = time.perf_counter()
    for _ in range(N):
        out = one(hm)
    fence(out)
    per_call = (time.perf_counter() - t0) / N * 1000

    fence(looped(hm))
    t0 = time.perf_counter()
    s = looped(hm)
    fence(s)
    per_loop = (time.perf_counter() - t0) / N * 1000

    print(f"dispatched : {per_call:7.3f} ms/frame  ({N} dispatches)")
    print(f"device-loop: {per_loop:7.3f} ms/frame  (1 dispatch, "
          f"lax.scan x{N})")
    print(f"per-dispatch overhead: {per_call - per_loop:+.3f} ms")


if __name__ == "__main__":
    main()
