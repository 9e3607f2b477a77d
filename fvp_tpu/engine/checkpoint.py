"""Checkpoint save/resume: full train state (params, batch stats, BOTH
optimizer states, step/epoch, best metric) in one file, plus a best-model
params-only file.

Behavioral reference: /root/reference/lib/utils/utils.py:74-98 and
run/train.py:126-160 (single checkpoint.pth.tar with both optimizers;
model_best strips the frozen backbone — here the backbone lives in its own
variables tree and is never checkpointed with the model).

Format: flax msgpack (not pickle — loading a checkpoint must never execute
arbitrary code). The train state is stored as its flat leaf list, which
works for any registered pytree root without teaching the codec about
custom dataclasses.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _write_atomic(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_checkpoint(out_dir: str, state, epoch: int, best_metric: float,
                    is_best: bool = False, step_in_epoch: int = 0) -> str:
    """step_in_epoch > 0 marks a MID-epoch checkpoint (periodic saves for
    stall-resilient training on a flaky device link — see
    tools/train_supervisor.py); resume fast-forwards the epoch's batch
    stream to that step."""
    os.makedirs(out_dir, exist_ok=True)
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state)]
    payload = {
        "epoch": epoch,
        "step_in_epoch": int(step_in_epoch),
        "best_metric": float(best_metric),
        "state": leaves,
    }
    path = os.path.join(out_dir, "checkpoint.msgpack")
    _write_atomic(path, serialization.msgpack_serialize(payload))

    if is_best:
        save_best(out_dir, state)
    return path


def save_best(out_dir: str, state) -> str:
    """Write model_best.msgpack (params AND batch_stats: eval with
    random-init BN running stats is garbage — the reference's model_best
    stores the full module state dict too, run/train.py:151-160).

    Separate from `save_checkpoint` so a new best found at an eval epoch
    is persisted immediately even when the rolling-checkpoint cadence
    (--checkpoint-every) skips that epoch."""
    os.makedirs(out_dir, exist_ok=True)
    bpath = os.path.join(out_dir, "model_best.msgpack")
    _write_atomic(bpath, serialization.msgpack_serialize(
        {"params": _to_host(state.params),
         "batch_stats": _to_host(state.batch_stats)}))
    return bpath


def load_checkpoint(out_dir: str, state_template):
    """Restore (state, epoch, best_metric) from out_dir, or None if absent."""
    path = os.path.join(out_dir, "checkpoint.msgpack")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    leaves_t, treedef = jax.tree_util.tree_flatten(state_template)
    stored = [payload["state"][k] for k in
              sorted(payload["state"], key=int)] \
        if isinstance(payload["state"], dict) else payload["state"]
    assert len(stored) == len(leaves_t), (len(stored), len(leaves_t))
    leaves = []
    for got, want in zip(stored, leaves_t):
        got = np.asarray(got)
        assert got.shape == np.shape(want), (got.shape, np.shape(want))
        leaves.append(got)
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return (state, int(payload["epoch"]), float(payload["best_metric"]),
            int(payload.get("step_in_epoch", 0)))


def load_best_params(out_dir: str, params_template):
    return load_params_file(os.path.join(out_dir, "model_best.msgpack"),
                            params_template)


def load_params_file(path: str, params_template) -> Any:
    """Load the params tree of a model_best.msgpack against a template for
    structural validation."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(params_template,
                                         payload["params"])


def load_model_file(path: str, variables_template) -> Any:
    """Load a model_best.msgpack into a full variables dict
    ({'params', 'batch_stats'}), validated against the template."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    out = dict(variables_template)
    out["params"] = serialization.from_state_dict(
        variables_template["params"], payload["params"])
    if "batch_stats" in payload and "batch_stats" in variables_template:
        out["batch_stats"] = serialization.from_state_dict(
            variables_template["batch_stats"], payload["batch_stats"])
    return out
