#!/usr/bin/env python
"""Weight-transplant LOCKSTEP A/B: the mechanical localizer for the
cross-framework convergence gap (CORRECTNESS_r04: fvp plateaus ~8 mm /
0.05 AP behind the reference's own torch code on byte-identical scenes;
init family, sampler numerics and seed luck are ruled out).

Protocol: build the reference torch model (seed S), TRANSPLANT its initial
weights into fvp (fvp_tpu/models/convert_tasknets.py — parity-tested), and
feed BOTH frameworks the byte-identical batch sequence: every batch is
produced ONCE by the reference's own data pipeline (FixedScenes ->
JointsDataset rendering/targets) and handed to both arms. Both arms run
the reference's exact optimizer schedule (torch: inline replica of
lib/core/function.py:28-85; fvp: TRAIN.ACCUMULATION_QUIRK). With weights,
data, and schedule identical, any trajectory split names a framework
asymmetry in the model/loss/optimizer math itself.

Stages (--stage):
  forward  transplant + one batch through both arms in TRAIN mode:
           per-loss deltas and per-module gradient agreement (rel-L2 +
           cosine). The first mismatching module IS the asymmetry.
  train    N lockstep steps: per-step loss table (steps.jsonl) +
           per-module parameter drift every --drift-every steps
           (drift.jsonl).
  data     no transplant: compare the two frameworks' OWN renderings of
           the same records (heatmaps/targets, augmentation OFF) — tests
           the data path instead of the model path.

Usage:
  python tools/ab_lockstep.py --stage forward
  python tools/ab_lockstep.py --stage train --steps 150
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pickle
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import torch

# reference-import shims (easydict/torchvision/json_tricks, sys.path to
# /root/reference/lib) execute at import:
import tools.ab_torch_arm as ta                           # noqa: F401
from core.config import config as ref_config, update_config  # noqa: E402
import models.faster_voxelpose as ref_fvp                 # noqa: E402

import jax                                                # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp                                   # noqa: E402

from fvp_tpu.config import load_config                    # noqa: E402
from fvp_tpu.data.registry import build_dataset           # noqa: E402
from fvp_tpu.engine.train import (                        # noqa: E402
    HDN_MODULES, create_train_state, make_train_step_fn, reset_accumulation,
)
from fvp_tpu.geometry.grids import build_rig_constants    # noqa: E402
from fvp_tpu.models.convert_tasknets import convert_task_nets  # noqa: E402
from fvp_tpu.models.faster_voxelpose import (             # noqa: E402
    FasterVoxelPose, compute_losses,
)

LOSS_KEYS = ("2d_heatmaps", "1d_heatmaps", "bbox", "joint")


# ---------------------------------------------------------------------------
# setup helpers
# ---------------------------------------------------------------------------

def build_ref_side(args):
    update_config(args.cfg_ref)
    with open(os.path.join(args.data, "scenes.pkl"), "rb") as f:
        scenes = pickle.load(f)
    with open(os.path.join(args.data, "cameras.pkl"), "rb") as f:
        cameras = pickle.load(f)
    if args.no_aug:
        ref_config.SYNTHETIC.DATA_AUGMENTATION = False
    ds = ta.FixedScenes(ref_config, scenes["train"], cameras, is_train=True)
    loader = torch.utils.data.DataLoader(
        ds, batch_size=ref_config.TRAIN.BATCH_SIZE, shuffle=False,
        num_workers=0, drop_last=True)
    rt = torch.as_tensor(ds.resize_transform, dtype=torch.float,
                         device="cpu")
    return ds, loader, rt, scenes


def build_fvp_side(args):
    cfg = load_config(args.cfg_fvp, sampling_backend="exact",
                      device_render=False, accumulation_quirk=True)
    if args.no_aug:
        cfg = cfg.replace(synthetic_augmentation=False)
    ds = build_dataset(cfg.train_dataset, cfg, is_train=True)
    rig = ds.rigs["synthetic"]
    rc = jax.tree_util.tree_map(jnp.asarray, build_rig_constants(cfg, rig))
    return cfg, ds, rc


def transplant(cfg, rc, tmodel):
    """fvp train state carrying the torch model's exact weights."""
    model = FasterVoxelPose(cfg=cfg)
    hm_w, hm_h = cfg.heatmap_size
    sample_hm = jnp.zeros((cfg.batch_size, cfg.num_views, cfg.num_joints,
                           hm_h, hm_w), jnp.float32)
    state = create_train_state(cfg, model, rc, sample_hm,
                               jax.random.PRNGKey(0))
    conv = convert_task_nets(
        {k: v.detach().clone() for k, v in tmodel.state_dict().items()})
    # structural sanity: identical tree layout, then swap the leaves in
    ref_leaves = jax.tree_util.tree_structure(state.params)
    got_leaves = jax.tree_util.tree_structure(conv["params"])
    assert ref_leaves == got_leaves, (ref_leaves, got_leaves)
    params = jax.tree_util.tree_map(jnp.asarray, conv["params"])
    stats = jax.tree_util.tree_map(jnp.asarray, conv["batch_stats"])
    state = dataclasses.replace(state, params=params, batch_stats=stats)
    return model, state


def to_fvp_batch(targets, meta, input_heatmaps):
    x = jnp.asarray(input_heatmaps.numpy())
    t = {k: jnp.asarray(np.asarray(targets[k]))
         for k in ("2d_heatmaps", "1d_heatmaps", "index", "bbox", "mask")}
    m = {
        "num_person": jnp.asarray(
            np.asarray(meta["num_person"], np.int32)),
        "joints_3d": jnp.asarray(
            np.asarray(meta["joints_3d"], np.float32)),
        "joints_3d_vis": jnp.asarray(
            np.asarray(meta["joints_3d_vis"], np.float32)),
        "roots_3d": jnp.asarray(np.asarray(meta["roots_3d"], np.float32)),
        "bbox": jnp.asarray(np.asarray(meta["bbox"], np.float32)),
    }
    return x, t, m


def torch_losses(tmodel, batch, cameras, rt):
    _, targets, meta, input_heatmaps = batch
    _, _, _, _, loss_dict = tmodel(
        backbone=None, meta=meta, input_heatmaps=input_heatmaps,
        targets=targets, cameras=cameras, resize_transform=rt)
    return loss_dict


def rel_l2(a_leaves, b_leaves):
    num = sum(float(jnp.sum((jnp.asarray(a) - jnp.asarray(b)) ** 2))
              for a, b in zip(a_leaves, b_leaves))
    den = sum(float(jnp.sum(jnp.asarray(a) ** 2)) for a in a_leaves)
    return float(np.sqrt(num) / (np.sqrt(den) + 1e-12))


def cosine(a_leaves, b_leaves):
    a = np.concatenate([np.asarray(x).ravel() for x in a_leaves])
    b = np.concatenate([np.asarray(x).ravel() for x in b_leaves])
    den = np.linalg.norm(a) * np.linalg.norm(b)
    return float(a @ b / den) if den > 0 else float("nan")


def module_leaves(tree):
    return {mod: jax.tree_util.tree_leaves(sub)
            for mod, sub in tree.items()}


def torch_grad_trees(tmodel):
    """Current .grad tensors as a converted fvp-layout params tree."""
    sd = {}
    for name, p in tmodel.named_parameters():
        g = p.grad
        sd[name] = (g.detach().clone() if g is not None
                    else torch.zeros_like(p))
    # converter also walks BN running stats; zeros keep the walk happy and
    # land in batch_stats, which the grad comparison ignores
    for name, b in tmodel.named_buffers():
        if "running_" in name:
            sd[name] = torch.zeros_like(b)
    return convert_task_nets(sd)["params"]


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def stage_forward(args):
    ds_t, loader, rt, _ = build_ref_side(args)
    cfg, _, rc = build_fvp_side(args)

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    random.seed(args.seed)
    tmodel = ref_fvp.get(ref_config)
    tmodel.train()

    model, state = transplant(cfg, rc, tmodel)

    np.random.seed(args.seed + 1)           # heatmap-aug draws (shared)
    random.seed(args.seed + 1)
    batch = next(iter(loader))
    x, t, m = to_fvp_batch(batch[1], batch[2], batch[3])

    # --- torch losses + per-optimizer grads
    loss_dict = torch_losses(tmodel, batch, ds_t.cameras, rt)
    hdn_loss = (loss_dict["2d_heatmaps"] + loss_dict["1d_heatmaps"]
                + loss_dict["bbox"])
    tmodel.zero_grad()
    hdn_loss.backward(retain_graph=True)
    loss_dict["joint"].backward()
    tgrads = torch_grad_trees(tmodel)

    # --- fvp losses + grads in one backward (train-mode forward)
    def loss_fn(params, stats):
        outputs, _ = model.apply(
            {"params": params, "batch_stats": stats}, x, rc, train=True,
            meta=m, mutable=["batch_stats"])
        losses = compute_losses(cfg, outputs, t, m)
        hdn = (losses["2d_heatmaps"] + losses["1d_heatmaps"]
               + losses["bbox"])
        return hdn + losses["joint"], losses

    (_, jlosses), jgrads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.batch_stats)

    report = {"losses": {}, "grads": {}}
    print("\n== forward losses (train mode, transplanted weights) ==")
    for k in LOSS_KEYS:
        tv, jv = float(loss_dict[k]), float(jlosses[k])
        rel = abs(tv - jv) / (abs(tv) + 1e-12)
        report["losses"][k] = {"torch": tv, "fvp": jv, "rel": rel}
        print(f"  {k:12s} torch {tv:.8f}  fvp {jv:.8f}  rel {rel:.2e}")

    print("\n== per-module gradient agreement ==")
    tl, jl = module_leaves(tgrads), module_leaves(jgrads)
    for mod in jl:
        r = rel_l2(tl[mod], jl[mod])
        c = cosine(tl[mod], jl[mod])
        report["grads"][mod] = {"rel_l2": r, "cosine": c}
        print(f"  {mod:12s} rel_l2 {r:.3e}  cosine {c:.6f}")

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "forward.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwrote {args.out}/forward.json")


def stage_train(args):
    ds_t, loader, rt, _ = build_ref_side(args)
    cfg, _, rc = build_fvp_side(args)

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    random.seed(args.seed)
    torch.set_num_threads(args.threads)
    tmodel = ref_fvp.get(ref_config)
    tmodel.train()
    optimizer = {
        "pose": torch.optim.Adam(tmodel.pose_net.parameters(),
                                 lr=ref_config.TRAIN.LR),
        "joint": torch.optim.Adam(tmodel.joint_net.parameters(),
                                  lr=ref_config.TRAIN.LR),
    }

    model, state = transplant(cfg, rc, tmodel)
    step_fn = jax.jit(make_train_step_fn(cfg, model))

    os.makedirs(args.out, exist_ok=True)
    steps_f = open(os.path.join(args.out, "steps.jsonl"), "w")
    drift_f = open(os.path.join(args.out, "drift.jsonl"), "w")

    k = ref_config.TRAIN.ACCUMULATION_STEPS if hasattr(
        ref_config.TRAIN, "ACCUMULATION_STEPS") else 4
    np.random.seed(args.seed + 1)           # heatmap-aug draws
    random.seed(args.seed + 1)

    step = 0
    t0 = time.time()
    while step < args.steps:
        # epoch boundary: reference resets the window (function.py:28-29)
        accu_loss = 0
        state = reset_accumulation(state)
        for i, batch in enumerate(loader):
            if step >= args.steps:
                break
            x, t, m = to_fvp_batch(batch[1], batch[2], batch[3])

            # ---- torch arm: inline replica of lib/core/function.py:37-85
            loss_dict = torch_losses(tmodel, batch, ds_t.cameras, rt)
            l2d, l1d = loss_dict["2d_heatmaps"], loss_dict["1d_heatmaps"]
            lbb, ljo = loss_dict["bbox"], loss_dict["joint"]
            if ljo > 0:
                optimizer["joint"].zero_grad()
                ljo.backward(retain_graph=True)
                optimizer["joint"].step()
            if isinstance(accu_loss, torch.Tensor) and (i + 1) % k == 0:
                optimizer["pose"].zero_grad()
                accu_loss.backward()
                optimizer["pose"].step()
                accu_loss = 0.0
            else:
                accu_loss = accu_loss + (l2d + l1d + lbb) / k

            # ---- fvp arm: quirk-enabled jitted step on the same batch
            state, jlosses = step_fn(state, x, rc, t, m)

            row = {"step": step,
                   "torch": {kk: float(loss_dict[kk]) for kk in LOSS_KEYS},
                   "fvp": {kk: float(jlosses[kk]) for kk in LOSS_KEYS}}
            steps_f.write(json.dumps(row) + "\n")
            steps_f.flush()
            if step % args.print_every == 0:
                dt = time.time() - t0
                print(f"[{step}] ({dt:5.0f}s) " + "  ".join(
                    f"{kk}: t {row['torch'][kk]:.6f} "
                    f"f {row['fvp'][kk]:.6f}" for kk in LOSS_KEYS),
                    flush=True)

            if (step + 1) % args.drift_every == 0 or step + 1 == args.steps:
                cur = convert_task_nets({kk: v.detach().clone() for kk, v
                                         in tmodel.state_dict().items()})
                tp = module_leaves(cur["params"])
                jp = module_leaves(state.params)
                ts = module_leaves(cur["batch_stats"])
                js = module_leaves(state.batch_stats)
                d = {"step": step,
                     "params": {mod: rel_l2(tp[mod], jp[mod])
                                for mod in jp},
                     "batch_stats": {mod: rel_l2(ts[mod], js[mod])
                                     for mod in js}}
                drift_f.write(json.dumps(d) + "\n")
                drift_f.flush()
                print(f"  drift params: " + "  ".join(
                    f"{mod} {d['params'][mod]:.3e}"
                    for mod in sorted(d["params"])), flush=True)
            step += 1

    steps_f.close()
    drift_f.close()
    print(f"done: {args.steps} lockstep steps -> {args.out}")


def stage_data(args):
    args.no_aug = True                       # determinism for bit-compare
    ds_t, _, _, scenes = build_ref_side(args)
    cfg, ds_j, _ = build_fvp_side(args)

    n = min(args.frames, len(scenes["train"]))
    worst = {"heatmaps": 0.0, "2d": 0.0, "1d": 0.0, "bbox": 0.0,
             "index": 0, "mask": 0, "joints": 0.0}
    for i in range(n):
        _, t_t, m_t, hm_t = ds_t[i]
        s = ds_j.sample(i, rng=np.random.RandomState(0))
        worst["heatmaps"] = max(worst["heatmaps"], float(np.max(np.abs(
            hm_t.numpy() - s["input_heatmaps"]))))
        worst["2d"] = max(worst["2d"], float(np.max(np.abs(
            np.asarray(t_t["2d_heatmaps"])
            - s["targets"]["2d_heatmaps"]))))
        worst["1d"] = max(worst["1d"], float(np.max(np.abs(
            np.asarray(t_t["1d_heatmaps"])
            - s["targets"]["1d_heatmaps"]))))
        worst["bbox"] = max(worst["bbox"], float(np.max(np.abs(
            np.asarray(t_t["bbox"]) - s["targets"]["bbox"]))))
        worst["index"] = max(worst["index"], int(np.max(np.abs(
            np.asarray(t_t["index"]).astype(np.int64)
            - s["targets"]["index"].astype(np.int64)))))
        worst["mask"] = max(worst["mask"], int(np.max(np.abs(
            np.asarray(t_t["mask"]).astype(np.int64)
            - s["targets"]["mask"].astype(np.int64)))))
        worst["joints"] = max(worst["joints"], float(np.max(np.abs(
            np.asarray(m_t["joints_3d"]) - s["meta"]["joints_3d"]))))
    print(f"\n== data-path parity over {n} frames (aug OFF) ==")
    for kk, v in worst.items():
        print(f"  max |delta| {kk:10s} {v}")
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "data_parity.json"), "w") as f:
        json.dump({"frames": n, "max_abs_delta": worst}, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=("forward", "train", "data"),
                    default="forward")
    ap.add_argument("--cfg-ref", default=os.path.join(
        REPO, "configs", "test", "ab_cross_ref.yaml"))
    ap.add_argument("--cfg-fvp", default=os.path.join(
        REPO, "configs", "test", "ab_cross_fvp.yaml"))
    ap.add_argument("--data", default="/tmp/fvp_ab")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "ab_r5", "lockstep"))
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--threads", type=int, default=3)
    ap.add_argument("--drift-every", type=int, default=25)
    ap.add_argument("--print-every", type=int, default=5)
    ap.add_argument("--no-aug", action="store_true",
                    help="disable heatmap augmentation on both arms")
    args = ap.parse_args()
    {"forward": stage_forward, "train": stage_train,
     "data": stage_data}[args.stage](args)


if __name__ == "__main__":
    main()
