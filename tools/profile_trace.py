#!/usr/bin/env python
"""Profiling harness: per-stage wall times + an XLA/TPU profiler trace.

The reference's profiling story is ad-hoc timer prints around the torch
forward (lib/core/function.py:137-156); here the same stage breakdown is
measured with compiled-executable fences AND a real `jax.profiler` trace is
captured so kernel-level time (MXU occupancy, fusion boundaries, transfer
gaps) can be inspected in TensorBoard / Perfetto.

Usage:
  python tools/profile_trace.py [--trace-dir /tmp/fvp_trace] [--iters 20]
  FVP_PLATFORM=cpu python tools/profile_trace.py --iters 2   # CPU smoke

Outputs:
  - stderr: stage table (backbone / whole-space HDN / per-person JLN / e2e)
  - trace-dir: profiler trace (open with TensorBoard's profile plugin or
    upload the .trace.json.gz to ui.perfetto.dev)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--trace-dir", default="/tmp/fvp_trace")
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--cfg", default=None,
                        help="experiment YAML (default: Panoptic flagship)")
    args = parser.parse_args()

    import jax

    if os.environ.get("FVP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["FVP_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    import jax.numpy as jnp

    from fvp_tpu.config import FVPConfig, load_config
    from fvp_tpu.geometry.grids import build_rig_constants
    from fvp_tpu.models.faster_voxelpose import FasterVoxelPose
    from fvp_tpu.models.resnet import PoseResNet
    from __graft_entry__ import _panoptic_rig

    on_tpu = not os.environ.get("FVP_PLATFORM")
    cfg = (load_config(args.cfg) if args.cfg
           else FVPConfig(
               compute_dtype="bfloat16",
               # match bench.py's serving lowerings so the trace profiles
               # what the headline number runs
               backbone_stem=os.environ.get(
                   "FVP_BACKBONE_STEM", "host_s2d" if on_tpu else "xla"),
               backbone_head=os.environ.get(
                   "FVP_BACKBONE_HEAD", "pallas" if on_tpu else "xla")))
    rig = _panoptic_rig(cfg.num_views, cfg)
    rc = jax.tree_util.tree_map(jnp.asarray, build_rig_constants(cfg, rig))
    model = FasterVoxelPose(cfg=cfg)
    backbone = PoseResNet(num_joints=cfg.num_joints,
                          num_layers=cfg.resnet_layers,
                          dtype=jnp.dtype(cfg.compute_dtype),
                          stem=cfg.backbone_stem, head=cfg.backbone_head)

    w, h = cfg.image_size
    hm_w, hm_h = cfg.heatmap_size
    rng = np.random.RandomState(0)
    images_np = rng.rand(1, cfg.num_views, h, w, 3).astype(np.float32)
    if cfg.backbone_stem == "host_s2d":
        from fvp_tpu.ops.pallas.stem import s2d_host
        images_np = s2d_host(images_np)
    images = jnp.asarray(images_np)
    hm = jnp.asarray(rng.rand(1, cfg.num_views, cfg.num_joints, hm_h, hm_w)
                     .astype(np.float32))

    key = jax.random.PRNGKey(0)
    bb_vars = backbone.init(key, images[0], train=False)
    variables = jax.jit(
        lambda k, s: model.init(k, s, rc, train=False))(key, hm)

    @jax.jit
    def f_backbone(images):
        B, V = images.shape[:2]
        flat = images.reshape(B * V, *images.shape[2:])
        return backbone.apply(bb_vars, flat, train=False)

    @jax.jit
    def f_pipeline(hm):
        return model.apply(variables, hm, rc, train=False)["fused_poses"]

    @jax.jit
    def f_e2e(images):
        B, V = images.shape[:2]
        flat = images.reshape(B * V, *images.shape[2:])
        out = backbone.apply(bb_vars, flat, train=False)
        hm = out.reshape(B, V, *out.shape[1:]).transpose(0, 1, 4, 2, 3)
        return model.apply(variables, hm, rc, train=False)["fused_poses"]

    def fence(out):
        return float(jnp.asarray(out).ravel()[0])

    def time_fn(fn, *a, iters=args.iters, warmup=3):
        for _ in range(warmup):
            fence(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        fence(out)
        return (time.perf_counter() - t0) / iters

    stages = [
        ("backbone", f_backbone, (images,)),
        ("hdn+jln pipeline", f_pipeline, (hm,)),
        ("end-to-end", f_e2e, (images,)),
    ]
    times = {}
    for name, fn, a in stages:
        times[name] = time_fn(fn, *a)
        log(f"{name:>18}: {times[name] * 1000:8.2f} ms")
    log(f"{'fps':>18}: {1.0 / times['end-to-end']:8.1f}")

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(3):
            fence(f_e2e(images))
    log(f"profiler trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
