#!/usr/bin/env python
"""Metric + speed A/B of the Pallas sampler band heights on a CONVERGED
checkpoint (the round-2 protocol that validated JLN 16 / whole 32: halve
the band, measure eval fps and AP/MPJPE deltas on the held-out set).

The band height is the matmul M dim of the sampler kernels
(ops/pallas/sampler.py): smaller = proportionally fewer MXU passes, more
out-of-band clipping (a geometric artifact class, not signal — see the
kernel docstring). Round 2 took 32/64 -> 16/32 for ~2x sampler speed at
-0.0002 mean AP; this probes 8/16.

Usage:
  python tools/ab_band_height.py --cfg configs/test/synthetic_convergence_r3.yaml \
      --checkpoint /tmp/fvp_conv_r3/synthetic_convergence_r3/model_best.msgpack
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("FVP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["FVP_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--bands", default="16:32,8:32,8:16,16:16",
                    help="comma list of jln:whole band-height pairs "
                         "(first entry = current default, the baseline)")
    args = ap.parse_args()

    from fvp_tpu.config import load_config
    from fvp_tpu.data.registry import build_dataset
    from fvp_tpu.engine.checkpoint import load_model_file
    from fvp_tpu.engine.validate import run_validation
    from fvp_tpu.geometry.grids import build_rig_constants
    from fvp_tpu.models.faster_voxelpose import FasterVoxelPose

    base = load_config(args.cfg)
    test_ds = build_dataset(base.test_dataset, base, is_train=False)
    rcs_by_cfg = {}

    rows = []
    for pair in args.bands.split(","):
        jln, whole = (int(x) for x in pair.split(":"))
        cfg = base.replace(jln_band_height=jln, whole_band_height=whole)
        model = FasterVoxelPose(cfg=cfg)
        rcs = {seq: jax.tree_util.tree_map(
            jnp.asarray, build_rig_constants(cfg, rig))
            for seq, rig in test_ds.rigs.items()}

        hm_w, hm_h = cfg.heatmap_size
        sample = jnp.zeros((1, cfg.num_views, cfg.num_joints, hm_h, hm_w))
        any_rc = next(iter(rcs.values()))
        variables = jax.jit(
            lambda k, s: model.init(k, s, any_rc, train=False)
        )(jax.random.PRNGKey(0), sample)
        variables = load_model_file(args.checkpoint, variables)

        res = run_validation(cfg, model, variables, test_ds, rcs,
                             log=lambda m: None)
        m = res.get("metrics", {})
        row = {"jln": jln, "whole": whole,
               "fps": round(res.get("fps", 0.0), 1),
               "mean_ap": round(float(m.get("mean_ap", 0)), 5),
               "ap25": round(float(m["ap"][25]), 5) if m else None,
               "mpjpe500": round(float(m.get("mpjpe@500", 0)), 3),
               "recall500": round(float(m.get("recall@500", 0)), 5)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    base_row = rows[0]
    for r in rows[1:]:
        print(f"jln {r['jln']} whole {r['whole']}: "
              f"dAP {r['mean_ap'] - base_row['mean_ap']:+.5f}  "
              f"dMPJPE {r['mpjpe500'] - base_row['mpjpe500']:+.3f} mm  "
              f"fps {base_row['fps']} -> {r['fps']}", flush=True)


if __name__ == "__main__":
    main()
