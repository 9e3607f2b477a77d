#!/usr/bin/env python
"""Multi-chip / multi-host scaling-efficiency harness.

North-star target: >= 80% scaling efficiency to 2 hosts (BASELINE.md). This
script measures end-to-end inference throughput at flagship Panoptic shapes
on (a) one chip and (b) a ('data' x 'view') mesh over every visible device,
and reports throughput-per-chip efficiency. On a single-chip machine it
still runs (efficiency of a 1-device mesh is 1.0 by construction), so the
same command produces the scaling table the moment real multi-chip hardware
appears.

Single host:      python tools/scaling_bench.py
Multi-host (2+):  run on every host with the same coordinator:
  python tools/scaling_bench.py \
      --coordinator <host0-ip>:8476 --num_hosts 2 --host_id <i>
(jax.distributed.initialize wires the hosts; collectives ride ICI within a
slice and DCN across hosts.)

CPU rehearsal:    FVP_PLATFORM=cpu FVP_CPU_DEVICES=8 python tools/scaling_bench.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("FVP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FVP_PLATFORM"])
if os.environ.get("FVP_CPU_DEVICES"):
    jax.config.update("jax_num_cpu_devices",
                      int(os.environ["FVP_CPU_DEVICES"]))
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def _fence(out):
    """Completion fence. Single-process: a scalar device fetch (this
    runtime's block_until_ready under-reports). Multi-process: the global
    output is not fully addressable, so fetch from the first local shard
    (still a real device->host readback)."""
    if out.is_fully_addressable:
        float(jnp.sum(out[..., 4]))
    else:
        np.asarray(out.addressable_shards[0].data).ravel()[:1]
        jax.block_until_ready(out)


def measure(step, args_, iters: int = 20, warmup: int = 2) -> float:
    """Steps/s with warm-up excluded (see _fence)."""
    for _ in range(warmup):
        out = step(*args_)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(*args_)
    _fence(out)
    return iters / (time.perf_counter() - t0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default="")
    parser.add_argument("--coordinator", default="",
                        help="host0 ip:port for multi-host")
    parser.add_argument("--num_hosts", type=int, default=1)
    parser.add_argument("--host_id", type=int, default=0)
    parser.add_argument("--batch_per_chip", type=int, default=1)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts, process_id=args.host_id)

    from __graft_entry__ import _panoptic_rig
    from fvp_tpu.config import FVPConfig, load_config
    from fvp_tpu.geometry.grids import build_rig_constants
    from fvp_tpu.models.faster_voxelpose import FasterVoxelPose
    from fvp_tpu.parallel.mesh import make_mesh, pick_mesh_shape
    from fvp_tpu.parallel.sharding import make_global, make_sharded_eval_step

    cfg = load_config(args.cfg) if args.cfg else FVPConfig()
    devices = jax.devices()
    n = len(devices)
    print(f"devices: {n} x {devices[0].device_kind}", flush=True)

    rig = _panoptic_rig(cfg.num_views, cfg)
    rc = jax.tree_util.tree_map(jnp.asarray, build_rig_constants(cfg, rig))
    model = FasterVoxelPose(cfg=cfg)
    hm_w, hm_h = cfg.heatmap_size
    rng = np.random.RandomState(0)

    def batch(B):
        return jnp.asarray(rng.rand(
            B, cfg.num_views, cfg.num_joints, hm_h, hm_w).astype(np.float32))

    hm1 = batch(args.batch_per_chip)
    variables = jax.jit(
        lambda k, s: model.init(k, s, rc, train=False)
    )(jax.random.PRNGKey(0), hm1)

    # -- single chip baseline (per-process local device) ----------------
    single = jax.jit(lambda v, h, r: model.apply(
        v, h, r, train=False)["fused_poses"])
    fps1 = measure(lambda *a: single(variables, hm1, rc), (),
                   iters=args.iters) * args.batch_per_chip
    print(f"1 chip: {fps1:.2f} frames/s", flush=True)

    results = {"n_devices": n, "n_processes": jax.process_count(),
               "fps_1chip": fps1}

    # -- full mesh (all devices, all processes) -------------------------
    if n > 1:
        from jax.sharding import PartitionSpec as P

        n_data, n_view = pick_mesh_shape(n, num_views=cfg.num_views)
        mesh = make_mesh(n_data, n_view)
        hmN = batch(args.batch_per_chip * n_data)
        # global arrays: batch sharded over ('data','view'), weights and
        # rig constants replicated — in multi-process mode each process
        # contributes its local shards (values identical across hosts:
        # same seed, deterministic init)
        g_vars, g_rc = make_global(
            (variables, rc), mesh,
            jax.tree_util.tree_map(lambda _: P(), (variables, rc)))
        g_hm = make_global(hmN, mesh, P("data", "view"))
        with mesh:
            step = make_sharded_eval_step(cfg, model, mesh)
            fpsN = measure(lambda *a: step(g_vars, g_hm, g_rc), (),
                           iters=args.iters) * args.batch_per_chip * n_data
        eff = fpsN / (fps1 * n)
        print(f"{n} chips ({n_data} data x {n_view} view, "
              f"{jax.process_count()} process(es)): "
              f"{fpsN:.2f} frames/s, scaling efficiency {eff:.1%}",
              flush=True)
        results.update({"fps_mesh": fpsN, "mesh": [n_data, n_view],
                        "efficiency": eff})

    if jax.process_index() == 0:
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
