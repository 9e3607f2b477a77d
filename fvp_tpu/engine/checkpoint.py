"""Checkpoint save/resume: full train state (params, batch stats, BOTH
optimizer states, step/epoch, best metric) in one file, plus a best-model
params-only file.

Behavioral reference: /root/reference/lib/utils/utils.py:74-98 and
run/train.py:126-160 (single checkpoint.pth.tar with both optimizers;
model_best strips the frozen backbone — here the backbone lives in its own
variables tree and is never checkpointed with the model).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(out_dir: str, state, epoch: int, best_metric: float,
                    is_best: bool = False) -> str:
    os.makedirs(out_dir, exist_ok=True)
    # serialize as a flat leaf list: works for any registered pytree
    # (flax's msgpack codec doesn't know custom dataclass roots)
    leaves = jax.tree_util.tree_leaves(_to_host(state))
    payload = {
        "epoch": epoch,
        "best_metric": float(best_metric),
        "state": serialization.to_bytes(leaves),
    }
    path = os.path.join(out_dir, "checkpoint.pkl")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)

    if is_best:
        best = {"params": serialization.to_bytes(_to_host(state.params))}
        bpath = os.path.join(out_dir, "model_best.pkl")
        with open(bpath + ".tmp", "wb") as f:
            pickle.dump(best, f)
        os.replace(bpath + ".tmp", bpath)
    return path


def load_checkpoint(out_dir: str, state_template):
    """Restore (state, epoch, best_metric) from out_dir, or None if absent."""
    path = os.path.join(out_dir, "checkpoint.pkl")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        payload = pickle.load(f)
    leaves_t, treedef = jax.tree_util.tree_flatten(state_template)
    leaves = serialization.from_bytes(
        jax.tree_util.tree_map(np.asarray, leaves_t), payload["state"])
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, payload["epoch"], payload["best_metric"]


def load_best_params(out_dir: str, params_template):
    path = os.path.join(out_dir, "model_best.pkl")
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return serialization.from_bytes(params_template, payload["params"])
