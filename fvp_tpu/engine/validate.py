"""Validation: jitted no-grad forward, pose collection, dataset evaluation,
FPS measurement with warm-up exclusion.

Behavioral reference: /root/reference/run/validate.py:94-154 and
lib/core/function.py:126-183 (device-synchronized batch timing, first
iteration excluded from FPS stats, fused poses concatenated then handed to
the dataset evaluator).

Multi-rig evaluation: the reference caches a projected sampling grid per
sequence (lib/models/project_whole.py:149-159) so each batch implicitly uses
its own calibration. Here rig constants are explicit step inputs, so eval
batches are grouped by sequence (never crossing a rig boundary) and each
batch is paired with its sequence's RigConstants; partial batches are padded
to the full batch size to keep a single compiled executable, and poses are
scattered back into record order for the evaluator.
"""

from __future__ import annotations

import time
from typing import Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fvp_tpu.config import FVPConfig
from fvp_tpu.data.loader import build_samples, collate, prefetch
from fvp_tpu.models.faster_voxelpose import FasterVoxelPose


def make_eval_step(cfg: FVPConfig, model: FasterVoxelPose,
                   backbone=None, backbone_vars=None, mesh=None):
    """Returns a jitted fn: (variables, batch_input, rc) -> fused poses.

    batch_input is images (B, V, H, W, 3) when the TEST heatmap source is
    'image' (the backbone runs in-step), a render-params dict (device-side
    heatmap splatting, ops/heatmap_render.py) when cfg.device_render, else
    precomputed heatmaps (B, V, J, h, w). A loaded backbone is ignored for
    gt/pred test sources — eval dispatch follows cfg.test_heatmap_src, not
    backbone presence (a config may carry PRETRAINED_BACKBONE for training
    while evaluating from rendered heatmaps).

    `mesh`: optional pipeline mesh (e.g. ('data', 'space') from
    parallel.spatial.make_pipeline_mesh). Batch inputs/outputs are sharded
    over 'data'; weights and rig constants replicated; the model's own
    `spatial_mesh` handles the in-model 'space' partitioning."""
    if cfg.test_heatmap_src != "image":
        backbone = None

    def eval_step(variables, batch_input, rc):
        if backbone is not None:
            B, V = batch_input.shape[:2]
            flat = batch_input.reshape(B * V, *batch_input.shape[2:])
            hm = backbone.apply(backbone_vars, flat, train=False)
            # (B*V, h, w, J) -> (B, V, J, h, w)
            heatmaps = hm.reshape(B, V, *hm.shape[1:]).transpose(
                0, 1, 4, 2, 3)
        elif isinstance(batch_input, Mapping):
            from fvp_tpu.ops.heatmap_render import render_heatmaps_device
            rp = batch_input
            heatmaps = render_heatmaps_device(
                cfg, rp["mu"], rp["vis"], rp["sigma"], rp["scale"],
                rp["occ"])
        else:
            heatmaps = batch_input
        out = model.apply(variables, heatmaps, rc, train=False)
        return out["fused_poses"]

    if mesh is None:
        return jax.jit(eval_step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data")) if "data" in mesh.axis_names \
        else repl

    def compiled(variables, batch_input, rc):
        def spec_of(tree, s):
            return jax.tree_util.tree_map(lambda _: s, tree)

        fn = jax.jit(eval_step,
                     in_shardings=(spec_of(variables, repl),
                                   spec_of(batch_input, data),
                                   spec_of(rc, repl)),
                     out_shardings=data)
        return fn(variables, batch_input, rc)

    return compiled


def eval_batches(dataset, batch_size: int):
    """Yield (seq, record_indices, valid_count) batches in record order,
    never crossing a sequence boundary; partial batches are right-padded by
    repeating the last index so every batch has one compiled shape."""
    by_seq: dict[str, list[int]] = {}
    for i, rec in enumerate(dataset.records):
        by_seq.setdefault(rec["seq"], []).append(i)
    for seq, idxs in by_seq.items():
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s:s + batch_size]
            valid = len(chunk)
            if valid < batch_size:
                chunk = chunk + [chunk[-1]] * (batch_size - valid)
            yield seq, np.asarray(chunk), valid


def run_validation(cfg: FVPConfig, model, variables, dataset, rcs,
                   backbone=None, backbone_vars=None,
                   batch_size: Optional[int] = None,
                   mesh=None,
                   log: Callable[[str], None] = print) -> dict:
    """Run the full eval loop; returns dict with fused poses, fps stats and
    (if the dataset has an evaluator) metrics.

    `rcs` is either a mapping {seq: RigConstants} (one entry per calibration,
    matching dataset.rigs) or a single RigConstants applied to every batch
    (single-rig datasets)."""
    bs = batch_size or cfg.test_batch_size
    if not isinstance(rcs, Mapping):
        rcs = {rec["seq"]: rcs for rec in dataset.records}
    if "packed" not in variables and "batch_stats" in variables:
        # hoist the Pallas serving kernels' weight packing out of the
        # jitted eval loop (engine/packing.py; no-op for paths that
        # don't read it)
        from fvp_tpu.engine.packing import pack_model_variables
        variables = pack_model_variables(cfg, variables)
    if (backbone is not None and backbone_vars is not None
            and getattr(backbone, "head", None) == "pallas"
            and "packed" not in backbone_vars):
        from fvp_tpu.engine.packing import pack_backbone_variables
        backbone_vars = pack_backbone_variables(backbone_vars)
    eval_step = make_eval_step(cfg, model, backbone, backbone_vars,
                               mesh=mesh)

    all_poses = None
    times = []

    # fixed eval RNG: when the dataset renders augmented heatmaps (e.g. the
    # synthetic held-out protocol), every validation run — and both arms of
    # a sampling-backend A/B — sees identical inputs
    eval_rng = np.random.RandomState((cfg.seed + 20260817) % (2 ** 31))

    def load(spec):
        seq, idx, valid = spec
        batch = collate(build_samples(dataset, idx, rng=eval_rng))
        return seq, idx, valid, batch

    it = prefetch(map(load, eval_batches(dataset, bs)))
    for i, (seq, idx, valid, batch) in enumerate(it):
        if "render_params" in batch:
            x = jax.tree_util.tree_map(jnp.asarray, batch["render_params"])
        else:
            x = batch.get("input_heatmaps", batch.get("images"))
            if ("input_heatmaps" not in batch
                    and cfg.backbone_stem == "host_s2d"):
                # Pallas stem input contract: ship space-to-depth frames
                from fvp_tpu.ops.pallas.stem import s2d_host
                x = s2d_host(np.asarray(x))
            x = jnp.asarray(x)
        t0 = time.perf_counter()
        poses = eval_step(variables, x, rcs[seq])
        poses.block_until_ready()
        dt = time.perf_counter() - t0
        times.append((dt, valid))
        poses = np.asarray(poses)
        if all_poses is None:
            all_poses = np.zeros((len(dataset),) + poses.shape[1:],
                                 poses.dtype)
        all_poses[idx[:valid]] = poses[:valid]
        if i % cfg.print_freq == 0:
            log(f"eval [{i}] seq {seq} batch {dt * 1000:.1f} ms "
                f"({valid / dt:.1f} samples/s)")

    result: dict = {"fused_poses": all_poses}

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
        result["metrics"] = dataset.evaluate(all_poses)
    return result
