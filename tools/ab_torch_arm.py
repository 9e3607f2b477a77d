#!/usr/bin/env python
"""Cross-framework A/B — TORCH ARM: train the reference's own PyTorch
implementation (/root/reference/lib) on the exported synthetic scenes and
evaluate it each epoch under the same AP/MPJPE protocol as the fvp_tpu arm.

This driver deliberately reuses the reference's OWN code end to end:
  * model        — models.faster_voxelpose.get (lib/models/faster_voxelpose.py:165)
  * data plumbing— dataset.JointsDataset (targets, gt heatmap rendering,
                   augmentation; lib/dataset/JointsDataset.py) via a thin
                   subclass that injects pre-generated scenes instead of
                   sampling them (mirrors lib/dataset/synthetic.py:126-135)
  * train loop   — core.function.train (lib/core/function.py:15), including
                   the dual-optimizer / 4-step accumulation schedule
  * eval loop    — core.function.validate (lib/core/function.py:126)

Only the evaluator is shared with the fvp arm: fvp_tpu.eval.ap, which is
parity-matched to the reference's Panoptic evaluator
(lib/dataset/panoptic.py:214-311) — so both arms are scored by one
implementation of one protocol on one set of held-out scenes.

Environment shims (CPU, no GPU, reference deps not all installed):
  * `easydict` is not installed — a minimal attribute-dict with the same
    semantics is registered in sys.modules before importing core.config.
  * torch.cuda.memory_allocated is patched to return 0 — the reference
    logs it unconditionally (function.py:93) and it raises on CPU-only
    builds.

Usage:
  python tools/ab_export_scenes.py                  # once
  python tools/ab_torch_arm.py [--cfg configs/test/ab_cross_ref.yaml]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import random
import sys
import time
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")   # never touch the TPU tunnel
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import torch

# ---------------------------------------------------------------------------
# easydict shim: dict with recursive attribute access (same observable
# semantics as the pypi package the reference imports).
# ---------------------------------------------------------------------------
if "easydict" not in sys.modules:
    class EasyDict(dict):
        def __init__(self, d=None, **kwargs):
            super().__init__()
            d = dict(d or {})
            d.update(kwargs)
            for k, v in d.items():
                setattr(self, k, v)

        def __setattr__(self, name, value):
            if isinstance(value, (list, tuple)):
                value = type(value)(
                    EasyDict(x) if isinstance(x, dict)
                    and not isinstance(x, EasyDict) else x for x in value)
            elif isinstance(value, dict) and not isinstance(value, EasyDict):
                value = EasyDict(value)
            super().__setattr__(name, value)
            super().__setitem__(name, value)

        __setitem__ = __setattr__

        def __getattr__(self, name):        # only called when not found
            raise AttributeError(name)

    _m = types.ModuleType("easydict")
    _m.EasyDict = EasyDict
    sys.modules["easydict"] = _m

sys.path.insert(1, "/root/reference/lib")

# torchvision is not installed; the reference only touches it inside the
# visualization helpers (lib/utils/vis.py:235, make_grid), which this
# protocol never calls (TRAIN/TEST.VISUALIZATION: false). Stub the module
# so `import torchvision` at lib/utils/vis.py:7 succeeds.
if "torchvision" not in sys.modules:
    _tv = types.ModuleType("torchvision")
    _tv.utils = types.SimpleNamespace(make_grid=None)
    sys.modules["torchvision"] = _tv

# json_tricks is not installed; the reference imports it in dataset modules
# (lib/dataset/synthetic.py:16) pulled in by dataset/__init__.py. The only
# use is plain-JSON calibration loading, which stdlib json covers.
if "json_tricks" not in sys.modules:
    import json as _json

    _jt = types.ModuleType("json_tricks")
    _jt.load, _jt.loads = _json.load, _json.loads
    _jt.dump, _jt.dumps = _json.dump, _json.dumps
    sys.modules["json_tricks"] = _jt

# reference logs CUDA memory unconditionally (lib/core/function.py:93);
# raise-free on CPU-only builds:
torch.cuda.memory_allocated = lambda *a, **k: 0

from core.config import config, update_config            # noqa: E402
import core.function as ref_function                     # noqa: E402
from dataset.JointsDataset import JointsDataset          # noqa: E402
import models.faster_voxelpose as ref_fvp                # noqa: E402

from fvp_tpu.eval.ap import evaluate_ap_mpjpe            # noqa: E402


class FixedScenes(JointsDataset):
    """Reference-code dataset over pre-generated scenes.

    Same construction pattern as the reference's Synthetic dataset
    (lib/dataset/synthetic.py:25-135) minus the sampling: db entries come
    from the exporter so both frameworks see identical records.
    """

    def __init__(self, cfg, records, cameras, is_train):
        super().__init__(cfg, is_train)
        self.has_evaluate_function = not is_train
        self.num_joints = cfg.DATASET.NUM_JOINTS
        # the Synthetic dataset overrides the augmentation gate with
        # SYNTHETIC.DATA_AUGMENTATION (synthetic.py:31)
        self.data_augmentation = cfg.SYNTHETIC.DATA_AUGMENTATION
        self.cameras = {"synthetic": cameras}
        for rec in records:
            self.db.append({
                "seq": rec["seq"],
                "joints_3d": np.array(rec["joints_3d"]),
                "joints_3d_vis": np.array(rec["joints_3d_vis"]),
            })
        self._gt = [(np.array(r["joints_3d"]), np.array(r["joints_3d_vis"]))
                    for r in records]
        self._rebuild_db()
        self.last_metrics: dict | None = None

    def __len__(self):
        return len(self.db)

    def evaluate(self, fused_poses):
        preds = fused_poses.detach().cpu().numpy()
        gts = [g for g, _ in self._gt]
        vis = [v for _, v in self._gt]
        m = evaluate_ap_mpjpe(preds, gts, vis)
        self.last_metrics = m
        msg = (f"AP25 {m['ap'][25]:.3f} AP50 {m['ap'][50]:.3f} "
               f"meanAP {m['mean_ap']:.3f} recall@500 {m['recall@500']:.3f} "
               f"MPJPE@500 {m['mpjpe@500']:.1f}mm")
        return m["mpjpe@500"], msg


class _NullWriter:
    def add_scalar(self, *a, **k):
        pass

    def close(self):
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=os.path.join(
        REPO, "configs", "test", "ab_cross_ref.yaml"))
    ap.add_argument("--data", default="/tmp/fvp_ab")
    ap.add_argument("--eval-every", type=int, default=1)
    ap.add_argument("--eval-seed", type=int, default=20260820,
                    help="np/random seed fixed before each eval pass so the "
                         "gt-heatmap augmentation draws are deterministic "
                         "(mirrors fvp_tpu's fixed eval RNG, "
                         "fvp_tpu/engine/validate.py:103-110)")
    ap.add_argument("--threads", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed (init draws + loader shuffle). "
                         "Sweeping it measures the torch arm's run-to-run "
                         "trajectory variance — the first remaining "
                         "suspect for the late-stage A/B gap "
                         "(CORRECTNESS_r04)")
    ap.add_argument("--out", default=None,
                    help="override OUTPUT_DIR (e.g. a per-seed dir)")
    args = ap.parse_args()

    torch.set_num_threads(args.threads)
    update_config(args.cfg)
    out = args.out or config.OUTPUT_DIR
    os.makedirs(out, exist_ok=True)

    import logging
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(message)s",
                        handlers=[logging.StreamHandler(sys.stdout),
                                  logging.FileHandler(
                                      os.path.join(out, "train.log"))])

    with open(os.path.join(args.data, "scenes.pkl"), "rb") as f:
        scenes = pickle.load(f)
    with open(os.path.join(args.data, "cameras.pkl"), "rb") as f:
        cameras = pickle.load(f)

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    random.seed(args.seed)

    train_ds = FixedScenes(config, scenes["train"], cameras, is_train=True)
    test_ds = FixedScenes(config, scenes["test"], cameras, is_train=False)
    train_loader = torch.utils.data.DataLoader(
        train_ds, batch_size=config.TRAIN.BATCH_SIZE, shuffle=True,
        num_workers=config.WORKERS, pin_memory=False, drop_last=True)
    test_loader = torch.utils.data.DataLoader(
        test_ds, batch_size=config.TEST.BATCH_SIZE, shuffle=False,
        num_workers=config.WORKERS, pin_memory=False)

    model = ref_fvp.get(config).to(config.DEVICE)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"reference model: {n_params / 1e6:.2f}M params", flush=True)

    # optimizer scheme of /root/reference/run/train.py:50-52
    optimizer = {
        "pose": torch.optim.Adam(model.pose_net.parameters(),
                                 lr=config.TRAIN.LR),
        "joint": torch.optim.Adam(model.joint_net.parameters(),
                                  lr=config.TRAIN.LR),
    }
    writer_dict = {"writer": _NullWriter(), "train_global_steps": 0,
                   "valid_global_steps": 0}

    rows = []
    metrics_path = os.path.join(out, "metrics.jsonl")
    for epoch in range(config.TRAIN.BEGIN_EPOCH, config.TRAIN.END_EPOCH):
        t0 = time.time()
        ref_function.train(config, None, model, optimizer, train_loader,
                           epoch, out, writer_dict)
        t_train = time.time() - t0
        row = {"epoch": epoch, "train_s": round(t_train, 1)}
        if (epoch + 1) % args.eval_every == 0 \
                or epoch == config.TRAIN.END_EPOCH - 1:
            np.random.seed(args.eval_seed)
            random.seed(args.eval_seed)
            t0 = time.time()
            ref_function.validate(config, None, model, test_loader, out,
                                  has_evaluate_function=True)
            m = test_ds.last_metrics
            row.update({"eval_s": round(time.time() - t0, 1),
                        "ap25": m["ap"][25], "ap50": m["ap"][50],
                        "mean_ap": m["mean_ap"],
                        "recall500": m["recall@500"],
                        "mpjpe500": m["mpjpe@500"]})
        rows.append(row)
        with open(metrics_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"[torch arm] {json.dumps(row)}", flush=True)
        torch.save(model.state_dict(), os.path.join(out, "model_last.pth"))

    print("[torch arm] done", flush=True)


if __name__ == "__main__":
    main()
