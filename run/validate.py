#!/usr/bin/env python
"""Validate CLI: `python run/validate.py --cfg configs/shelf/jln64.yaml
[--checkpoint output/jln64/model_best.msgpack]`.

Behavioral reference: /root/reference/run/validate.py — load best weights,
timed no-grad loop with device sync, FPS stats excluding warm-up, final
dataset evaluation.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("FVP_PLATFORM"):
    # sitecustomize pins JAX_PLATFORMS before we run; this is the working
    # override for CPU runs (e.g. FVP_PLATFORM=cpu for machines w/o TPU)
    jax.config.update("jax_platforms", os.environ["FVP_PLATFORM"])
if os.environ.get("FVP_CPU_DEVICES"):
    # virtual CPU device count, e.g. FVP_CPU_DEVICES=8 to rehearse
    # --mesh data=2,space=4 without TPU hardware
    jax.config.update("jax_num_cpu_devices",
                      int(os.environ["FVP_CPU_DEVICES"]))
import jax.numpy as jnp

from fvp_tpu.config import load_config
from fvp_tpu.data.registry import build_dataset
from fvp_tpu.engine.validate import run_validation
from fvp_tpu.geometry.grids import build_rig_constants
from fvp_tpu.models.faster_voxelpose import FasterVoxelPose
from fvp_tpu.utils.logging import create_logger


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--checkpoint", default=None,
                        help="model_best.msgpack from training")
    parser.add_argument("--seed", type=int, default=None,
                        help="override cfg.seed. Eval heatmap-augmentation "
                             "draws derive from it (engine/validate.py "
                             "eval_rng), so sweeping seeds on one "
                             "checkpoint measures eval-draw noise; frozen "
                             "SCENE_FILE scenes are unaffected")
    parser.add_argument("--sampling-backend", default=None,
                        choices=["auto", "pallas", "exact"],
                        help="override MODEL.SAMPLING_BACKEND (for "
                             "pallas-vs-exact A/B evals)")
    parser.add_argument("--mesh", default=None,
                        help="pipeline mesh spec, e.g. 'data=2,space=4': "
                             "shard eval batches over 'data' and the "
                             "whole-space voxel volume over 'space' "
                             "(voxel-block spatial parallelism with halo "
                             "exchange at block seams)")
    args = parser.parse_args()

    cfg = load_config(args.cfg)
    if args.seed is not None:
        cfg = cfg.replace(seed=args.seed)
    if args.sampling_backend:
        cfg = cfg.replace(sampling_backend=args.sampling_backend)
    cfg_name = os.path.splitext(os.path.basename(args.cfg))[0]
    logger, out_dir = create_logger(cfg.output_dir, cfg_name, "validate")

    mesh = None
    if args.mesh:
        from fvp_tpu.parallel.spatial import make_pipeline_mesh

        spec = dict(kv.split("=") for kv in args.mesh.split(","))
        n_data = int(spec.pop("data", 1))
        n_space = int(spec.pop("space", 1))
        if spec:
            parser.error(f"unknown mesh axes {sorted(spec)} "
                         "(supported: data, space)")
        mesh = make_pipeline_mesh(n_data, n_space)
        logger.info(f"pipeline mesh: {n_data} data x {n_space} space over "
                    f"{jax.device_count()} devices")
        if cfg.batch_size % n_data:
            logger.warning("TEST batch size not divisible by the data axis")

    test_ds = build_dataset(cfg.test_dataset, cfg, is_train=False)
    logger.info(f"test: {len(test_ds)} frames")
    model = FasterVoxelPose(cfg=cfg, spatial_mesh=mesh)

    from run.train import load_backbone
    backbone, backbone_vars = load_backbone(cfg)

    rcs = {seq: jax.tree_util.tree_map(
        jnp.asarray, build_rig_constants(cfg, rig))
        for seq, rig in test_ds.rigs.items()}
    rc = next(iter(rcs.values()))   # init-only sample rig

    ckpt_path = args.checkpoint or os.path.join(out_dir,
                                                "model_best.msgpack")
    hm_w, hm_h = cfg.heatmap_size
    sample = jnp.zeros((1, cfg.num_views, cfg.num_joints, hm_h, hm_w),
                       jnp.float32)
    variables = jax.jit(
        lambda k, s: model.init(k, s, rc, train=False)
    )(jax.random.PRNGKey(0), sample)
    if os.path.exists(ckpt_path):
        from fvp_tpu.engine.checkpoint import load_model_file

        variables = load_model_file(ckpt_path, variables)
        logger.info(f"loaded {ckpt_path}")
    else:
        logger.warning(f"no checkpoint at {ckpt_path}; random weights")

    res = run_validation(cfg, model, variables, test_ds, rcs,
                         backbone=backbone, backbone_vars=backbone_vars,
                         mesh=mesh, log=logger.info)
    if "fps" in res:
        logger.info(f"FPS (warm-up excluded): {res['fps']:.2f}  "
                    f"batch ms: {res['batch_ms']}")
    if "metrics" in res:
        logger.info(f"metrics: {res['metrics']}")


if __name__ == "__main__":
    main()
