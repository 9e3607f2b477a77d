"""Validation: jitted no-grad forward, pose collection, dataset evaluation,
FPS measurement with warm-up exclusion.

Behavioral reference: /root/reference/run/validate.py:94-154 and
lib/core/function.py:126-183 (device-synchronized batch timing, first
iteration excluded from FPS stats, fused poses concatenated then handed to
the dataset evaluator).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fvp_tpu.config import FVPConfig
from fvp_tpu.data.loader import batch_iterator, prefetch
from fvp_tpu.models.faster_voxelpose import FasterVoxelPose


def make_eval_step(cfg: FVPConfig, model: FasterVoxelPose,
                   backbone=None, backbone_vars=None):
    """Returns a jitted fn: (variables, batch_input, rc) -> fused poses.

    With a backbone, batch_input is images (B, V, H, W, 3); otherwise
    precomputed heatmaps (B, V, J, h, w)."""

    @jax.jit
    def eval_step(variables, batch_input, rc):
        if backbone is not None:
            B, V = batch_input.shape[:2]
            flat = batch_input.reshape(B * V, *batch_input.shape[2:])
            hm = backbone.apply(backbone_vars, flat, train=False)
            # (B*V, h, w, J) -> (B, V, J, h, w)
            heatmaps = hm.reshape(B, V, *hm.shape[1:]).transpose(
                0, 1, 4, 2, 3)
        else:
            heatmaps = batch_input
        out = model.apply(variables, heatmaps, rc, train=False)
        return out["fused_poses"]

    return eval_step


def run_validation(cfg: FVPConfig, model, variables, dataset, rc,
                   backbone=None, backbone_vars=None,
                   batch_size: Optional[int] = None,
                   log: Callable[[str], None] = print) -> dict:
    """Run the full eval loop; returns dict with fused poses, fps stats and
    (if the dataset has an evaluator) metrics."""
    bs = batch_size or cfg.test_batch_size
    eval_step = make_eval_step(cfg, model, backbone, backbone_vars)

    all_poses = []
    times = []
    it = prefetch(batch_iterator(dataset, bs, shuffle=False))
    for i, batch in enumerate(it):
        x = batch.get("input_heatmaps", batch.get("images"))
        x = jnp.asarray(x)
        t0 = time.perf_counter()
        poses = eval_step(variables, x, rc)
        poses.block_until_ready()
        dt = time.perf_counter() - t0
        times.append((dt, x.shape[0]))
        all_poses.append(np.asarray(poses))
        if i % cfg.print_freq == 0:
            log(f"eval [{i}] batch {dt * 1000:.1f} ms "
                f"({x.shape[0] / dt:.1f} samples/s)")

    fused = np.concatenate(all_poses, axis=0)
    result: dict = {"fused_poses": fused}

    if len(times) > 1:   # exclude compile/warm-up like the reference
        samples = sum(n for _, n in times[1:])
        secs = sum(t for t, _ in times[1:])
        result["fps"] = samples / secs
        result["batch_ms"] = {
            "mean": 1000 * np.mean([t for t, _ in times[1:]]),
            "min": 1000 * np.min([t for t, _ in times[1:]]),
            "max": 1000 * np.max([t for t, _ in times[1:]]),
        }

    if getattr(dataset, "has_evaluate_function", False):
        result["metrics"] = dataset.evaluate(fused)
    return result
