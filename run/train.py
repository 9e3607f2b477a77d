#!/usr/bin/env python
"""Train CLI: `python run/train.py --cfg configs/shelf/jln64.yaml`.

Behavioral reference: /root/reference/run/train.py — config overlay, logger,
datasets, model + optional frozen backbone, per-epoch validate with
best-checkpoint tracking, resume support. Batches are grouped by sequence so
each jitted step sees a single camera rig (the rig constants are step
inputs, so all sequences share one compiled executable).
"""

from __future__ import annotations

import argparse
import os
import faulthandler
import signal
import sys
import time

# SIGUSR1 dumps all thread stacks to stderr — the way to diagnose a stall
# (e.g. a dropped device-tunnel call) without killing the run
faulthandler.register(signal.SIGUSR1, all_threads=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("FVP_PLATFORM"):
    # sitecustomize pins JAX_PLATFORMS before we run; this is the working
    # override for CPU runs (e.g. FVP_PLATFORM=cpu for machines w/o TPU)
    jax.config.update("jax_platforms", os.environ["FVP_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from fvp_tpu.config import load_config
from fvp_tpu.data.loader import build_samples, collate, prefetch
from fvp_tpu.data.registry import build_dataset
from fvp_tpu.engine.checkpoint import (
    load_checkpoint, save_best, save_checkpoint,
)
from fvp_tpu.engine.train import (
    create_train_state, make_train_step, reset_accumulation,
)
from fvp_tpu.engine.validate import run_validation
from fvp_tpu.geometry.grids import build_rig_constants
from fvp_tpu.models.faster_voxelpose import FasterVoxelPose
from fvp_tpu.models.resnet import PoseResNet
from fvp_tpu.utils.logging import AverageMeter, MetricWriter, create_logger


def seq_grouped_batches(dataset, batch_size, seed, epoch):
    """Yield (seq, batch) with every batch drawn from a single sequence."""
    rng = np.random.RandomState(seed + epoch)
    by_seq: dict[str, list[int]] = {}
    for i, rec in enumerate(dataset.records):
        by_seq.setdefault(rec["seq"], []).append(i)
    chunks = []
    for seq, idxs in by_seq.items():
        idxs = np.asarray(idxs)
        rng.shuffle(idxs)
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s:s + batch_size]
            if len(chunk) == batch_size:       # fixed shapes: drop remainder
                chunks.append((seq, chunk))
    order = rng.permutation(len(chunks))
    for ci in order:
        seq, idxs = chunks[ci]
        yield seq, collate(build_samples(dataset, idxs, rng))


def load_backbone(cfg):
    if not cfg.pretrained_backbone:
        return None, None
    backbone = PoseResNet(num_joints=cfg.num_joints,
                          num_layers=cfg.resnet_layers,
                          dtype=jnp.dtype(cfg.compute_dtype),
                          stem=cfg.backbone_stem, head=cfg.backbone_head)
    path = cfg.pretrained_backbone
    if path.endswith((".pth", ".tar")):
        import torch

        from fvp_tpu.models.resnet import convert_torch_state
        state = torch.load(path, map_location="cpu", weights_only=False)
        state = {k: v.numpy() for k, v in state.items()}
        variables = convert_torch_state(state, num_layers=cfg.resnet_layers)
    else:
        # native format: flax msgpack (no code execution on load), as
        # written by tools/convert_backbone.py
        from flax import serialization

        with open(path, "rb") as f:
            variables = serialization.msgpack_restore(f.read())
    return backbone, variables


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--save-every", type=int, default=0,
                        help="also checkpoint every N steps mid-epoch "
                             "(stall resilience; 0 = per-epoch only)")
    parser.add_argument("--checkpoint-every", type=int, default=1,
                        help="save the rolling checkpoint every N epochs "
                             "(always on the final epoch; the best-model "
                             "copy refreshes only at save points). "
                             "Per-epoch saves cost ~30 s of device->host "
                             "transfer on the tunneled chip, which "
                             "dominates small-protocol epochs")
    parser.add_argument("--eval-every", type=int, default=1,
                        help="run the held-out evaluation every N epochs "
                             "(always on the final epoch). Eval draws its "
                             "own fixed RNG, so the cadence never changes "
                             "the training trajectory")
    parser.add_argument("--torch-init", action="store_true",
                        help="redraw weights from the REFERENCE's actual "
                             "init scheme (N(0,0.001) convs + zero bias "
                             "for CenterNet/C2C/P2P, torch defaults for "
                             "WeightNet — engine/init.py reference_reinit)")
    args = parser.parse_args()
    if args.checkpoint_every < 1:
        parser.error("--checkpoint-every must be >= 1 (per-epoch cadence; "
                     "use --save-every for mid-epoch saves)")
    if args.eval_every < 1:
        parser.error("--eval-every must be >= 1")

    cfg = load_config(args.cfg)
    if args.epochs is not None:
        cfg = cfg.replace(end_epoch=args.epochs)
    cfg_name = os.path.splitext(os.path.basename(args.cfg))[0]
    logger, out_dir = create_logger(cfg.output_dir, cfg_name, "train")
    writer = MetricWriter(out_dir)
    logger.info(f"config: {cfg}")
    logger.info(f"devices: {jax.devices()}")

    train_ds = build_dataset(cfg.train_dataset, cfg, is_train=True)
    test_ds = build_dataset(cfg.test_dataset, cfg, is_train=False)
    logger.info(f"train: {len(train_ds)} frames, test: {len(test_ds)}")
    if cfg.lr_decay_epochs and not cfg.steps_per_epoch:
        # the LR schedule counts optimizer steps: fill in the epoch length
        cfg = cfg.replace(
            steps_per_epoch=max(len(train_ds) // cfg.batch_size, 1))

    backbone, backbone_vars = load_backbone(cfg)
    if backbone_vars is not None:
        # device-put once: numpy trees passed to a jitted step re-transfer
        # the full ResNet-50 host->device EVERY step otherwise
        backbone_vars = jax.tree_util.tree_map(jnp.asarray, backbone_vars)
    model = FasterVoxelPose(cfg=cfg)

    # rig constants per sequence (device-resident, same shapes => one jit)
    rcs = {seq: jax.tree_util.tree_map(
        jnp.asarray, build_rig_constants(cfg, rig))
        for seq, rig in train_ds.rigs.items()}

    hm_w, hm_h = cfg.heatmap_size
    sample_hm = jnp.zeros(
        (cfg.batch_size, cfg.num_views, cfg.num_joints, hm_h, hm_w),
        jnp.float32)
    any_rc = next(iter(rcs.values()))
    state = create_train_state(cfg, model, any_rc, sample_hm,
                               jax.random.PRNGKey(cfg.seed))
    # (init_scheme values are validated by FVPConfig.__post_init__)
    if args.torch_init or cfg.init_scheme == "reference":
        import dataclasses

        from fvp_tpu.engine.init import reference_reinit
        state = dataclasses.replace(state, params=reference_reinit(
            state.params, jax.random.PRNGKey(cfg.seed + 77)))
        logger.info("re-initialized params from the reference's init "
                    "scheme (--torch-init / TRAIN.INIT_SCHEME=reference)")
    start_epoch, best, start_step = cfg.begin_epoch, -np.inf, 0
    if args.resume:
        restored = load_checkpoint(out_dir, state)
        if restored:
            state, start_epoch, best, start_step = restored
            logger.info(f"resumed from epoch {start_epoch}"
                        + (f" step {start_step}" if start_step else ""))

    # image-source training runs the FROZEN backbone inside the jitted step
    # (reference lib/core/function.py:38-51); gt/pred sources bypass it
    train_backbone = backbone if cfg.train_heatmap_src == "image" else None
    if cfg.train_heatmap_src == "image" and backbone is None:
        raise ValueError("TRAIN_HEATMAP_SRC=image requires "
                         "NETWORK.PRETRAINED_BACKBONE")
    step_fn = make_train_step(cfg, model, train_backbone)
    eval_step_every = max(len(train_ds) // cfg.batch_size, 1)

    for epoch in range(start_epoch, cfg.end_epoch):
        if cfg.accumulation_quirk and not (epoch == start_epoch
                                           and start_step):
            # reference resets the accumulation window per epoch
            # (function.py:28-29); a mid-epoch resume keeps the
            # checkpointed window instead
            state = reset_accumulation(state)
        meters = {k: AverageMeter() for k in
                  ("total", "2d_heatmaps", "1d_heatmaps", "bbox", "joint",
                   "batch_time")}
        it = prefetch(iter(seq_grouped_batches(
            train_ds, cfg.batch_size, cfg.seed, epoch)))
        pending: list = []
        t_end = time.perf_counter()
        for i, (seq, batch) in enumerate(it):
            if epoch == start_epoch and i < start_step:
                continue       # fast-forward a mid-epoch resume
            if train_backbone is not None:
                x = jnp.asarray(batch["images"])
            elif "render_params" in batch:
                x = jax.tree_util.tree_map(jnp.asarray,
                                           batch["render_params"])
            else:
                x = jnp.asarray(batch["input_heatmaps"])
            targets = jax.tree_util.tree_map(jnp.asarray, batch["targets"])
            meta = jax.tree_util.tree_map(jnp.asarray, batch["meta"])
            state, losses = step_fn(state, x, rcs[seq], targets, meta,
                                    backbone_vars)

            # keep losses as device scalars between prints: a float()
            # here would sync host<->device every step and stall the
            # async dispatch pipeline
            pending.append(losses)
            now = time.perf_counter()
            meters["batch_time"].update(now - t_end)
            t_end = now

            if i % cfg.print_freq == 0:
                for ls in pending:
                    ls = {k: float(v) for k, v in ls.items()}
                    for k in ("total", "2d_heatmaps", "1d_heatmaps",
                              "bbox", "joint"):
                        meters[k].update(ls[k])
                pending.clear()
                logger.info(
                    f"epoch {epoch} [{i}/{eval_step_every}] "
                    f"loss {meters['total'].avg:.5f} "
                    f"(2d {meters['2d_heatmaps'].avg:.5f} "
                    f"1d {meters['1d_heatmaps'].avg:.5f} "
                    f"bbox {meters['bbox'].avg:.5f} "
                    f"joint {meters['joint'].avg:.5f}) "
                    f"batch {meters['batch_time'].avg * 1000:.0f} ms")
                writer.add_scalars(int(state.step), **{
                    f"train_loss_{k}": meters[k].avg
                    for k in ("total", "2d_heatmaps", "1d_heatmaps",
                              "bbox", "joint")})

            if args.save_every and i and i % args.save_every == 0:
                save_checkpoint(out_dir, state, epoch, best,
                                step_in_epoch=i + 1)

        has_eval = getattr(test_ds, "has_evaluate_function", False)
        # without an evaluator there is no score: best == latest weights
        is_best = not has_eval
        do_eval = ((epoch + 1) % args.eval_every == 0
                   or epoch == cfg.end_epoch - 1)
        if do_eval and has_eval:
            test_rcs = {seq: jax.tree_util.tree_map(
                jnp.asarray, build_rig_constants(cfg, rig))
                for seq, rig in test_ds.rigs.items()}
            res = run_validation(
                cfg, model,
                {"params": state.params, "batch_stats": state.batch_stats},
                test_ds, test_rcs, backbone=backbone,
                backbone_vars=backbone_vars, log=logger.info)
            metrics = res.get("metrics", {})
            logger.info(f"epoch {epoch} metrics: {metrics}")
            score = metrics.get("mean_ap", metrics.get("avg_pcp", 0.0))
            if score >= best:
                best = score
                # persist the new best NOW: the rolling-checkpoint cadence
                # below may skip this epoch, and `best` must never record a
                # score whose weights were not written
                save_best(out_dir, state)
                logger.info(f"saved model_best (score {score:.4f})")
            writer.add_scalars(int(state.step), eval_score=score)

        do_save = ((epoch + 1) % args.checkpoint_every == 0
                   or epoch == cfg.end_epoch - 1)
        if do_save:
            save_checkpoint(out_dir, state, epoch + 1, best, is_best=is_best)
            logger.info("saved checkpoint")


if __name__ == "__main__":
    main()
