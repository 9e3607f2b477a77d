"""TRAIN.ACCUMULATION_QUIRK: exact replication of the reference's
accumulate-then-step interleaving (lib/core/function.py:28,79-85) —
the HDN optimizer steps at every k-th batch on the previous k-1 batches
only; the stepping batch's detection loss is dropped from the window;
windows reset per epoch."""

import jax
import jax.numpy as jnp
import numpy as np

from fvp_tpu.data.loader import collate
from fvp_tpu.data.synthetic import SyntheticDataset
from fvp_tpu.engine.train import (
    HDN_MODULES, create_train_state, make_train_step, make_train_step_fn,
    reset_accumulation,
)
from fvp_tpu.geometry.grids import build_rig_constants
from fvp_tpu.models.faster_voxelpose import FasterVoxelPose
from tests.helpers import random_rig, tiny_config


def _cfg(**kw):
    base = dict(
        num_joints=15, num_views=3,
        heatmap_size=(60, 32),
        voxels_per_axis=(32, 32, 8),
        ind_voxels_per_axis=(16, 16, 16),
        ind_space_size=(2000.0, 2000.0, 2000.0),
        space_size=(8000.0, 8000.0, 2000.0),
        space_center=(0.0, -500.0, 800.0),
        max_people=4,
        train_heatmap_src="gt",
        test_heatmap_src="gt",
        synthetic_max_people=2,
        synthetic_num_data=16,
        synthetic_augmentation=False,
        batch_size=2,
        lr=2e-3,
        accumulation_steps=4,
        accumulation_quirk=True,
    )
    base.update(kw)
    return tiny_config(**base)


def _batches(cfg, rng, n):
    rig = random_rig(rng, num_views=cfg.num_views)
    ds = SyntheticDataset(cfg, rig, seed=3)
    rc = build_rig_constants(cfg, rig)
    out = []
    for b in range(n):
        batch = collate([ds.sample(2 * b + i,
                                   rng=np.random.RandomState(97 * b + i))
                         for i in range(cfg.batch_size)])
        out.append((
            jnp.asarray(batch["input_heatmaps"]),
            jax.tree_util.tree_map(jnp.asarray, batch["targets"]),
            jax.tree_util.tree_map(jnp.asarray, batch["meta"]),
        ))
    return rc, out


def _hdn(params):
    return {k: v for k, v in params.items() if k in HDN_MODULES}


def _trees_equal(a, b):
    return all(bool(jnp.array_equal(x, y)) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def _run(cfg, rc, batches, state, step):
    hdn_snapshots = [_hdn(state.params)]
    for hm, targets, meta in batches:
        state, _ = step(state, hm, rc, targets, meta)
        hdn_snapshots.append(_hdn(state.params))
    return state, hdn_snapshots


def test_quirk_step_timing_and_window_drop(rng):
    cfg = _cfg()
    rc, batches = _batches(cfg, rng, 8)
    model = FasterVoxelPose(cfg=cfg)
    state0 = create_train_state(cfg, model, rc, batches[0][0],
                                jax.random.PRNGKey(0))
    # no donation: state0 and the per-step snapshots must stay alive
    step = jax.jit(make_train_step_fn(cfg, model))

    state, snaps = _run(cfg, rc, batches, state0, step)

    # HDN params change ONLY at the k-th batches (0-based calls 3 and 7)
    for i in range(8):
        changed = not _trees_equal(snaps[i], snaps[i + 1])
        assert changed == (i in (3, 7)), (i, changed)
    assert int(state.acc_count) == 8
    assert float(state.acc_loss) == 0.0     # call 7 stepped and reset

    # THE quirk: the stepping batch is dropped from the window entirely.
    # Replacing batch 3 with a wildly different batch must leave the HDN
    # params after call 3 bitwise identical...
    wild_hm = batches[7][0] * 5.0
    alt = list(batches)
    alt[3] = (wild_hm, batches[7][1], batches[7][2])
    state_b, snaps_b = _run(cfg, rc, alt[:4], state0, step)
    assert _trees_equal(snaps[4], snaps_b[4])
    # ...while the JLN (stepped every batch) and the BN batch_stats did see
    # batch 3 — the batch ran, only its detection loss was dropped
    jln_a = {k: v for k, v in snaps[4].items()}  # hdn only; compare stats
    del jln_a
    assert not _trees_equal(state.batch_stats, state_b.batch_stats)


def test_quirk_epoch_reset(rng):
    cfg = _cfg()
    rc, batches = _batches(cfg, rng, 6)
    model = FasterVoxelPose(cfg=cfg)
    state = create_train_state(cfg, model, rc, batches[0][0],
                               jax.random.PRNGKey(0))
    step = jax.jit(make_train_step_fn(cfg, model))   # no donation

    # epoch of 6 batches: step at call 3, then 4,5 accumulate
    state, snaps = _run(cfg, rc, batches, state, step)
    assert int(state.acc_count) == 6 and float(state.acc_loss) > 0

    # epoch boundary: window must restart — next step lands at call 3 of
    # the new epoch, not at global call 7
    state = reset_accumulation(state)
    assert int(state.acc_count) == 0 and float(state.acc_loss) == 0.0
    assert all(float(jnp.abs(leaf).max()) == 0.0
               for leaf in jax.tree_util.tree_leaves(state.acc_grads))
    state, snaps = _run(cfg, rc, batches[:4], state, step)
    changed = [not _trees_equal(snaps[i], snaps[i + 1]) for i in range(4)]
    assert changed == [False, False, False, True]


def test_quirk_checkpoint_roundtrip(tmp_path, rng):
    """The acc_* window state must survive save/load (mid-epoch resume)."""
    from fvp_tpu.engine.checkpoint import load_checkpoint, save_checkpoint

    cfg = _cfg()
    rc, batches = _batches(cfg, rng, 2)
    model = FasterVoxelPose(cfg=cfg)
    state = create_train_state(cfg, model, rc, batches[0][0],
                               jax.random.PRNGKey(0))
    step = make_train_step(cfg, model)
    for hm, targets, meta in batches:
        state, _ = step(state, hm, rc, targets, meta)

    save_checkpoint(str(tmp_path), state, epoch=0, best_metric=0.0,
                    step_in_epoch=2)
    template = create_train_state(cfg, model, rc, batches[0][0],
                                  jax.random.PRNGKey(1))
    restored, epoch, best, sie = load_checkpoint(str(tmp_path), template)
    assert sie == 2
    assert int(restored.acc_count) == int(state.acc_count) == 2
    np.testing.assert_array_equal(np.asarray(restored.acc_loss),
                                  np.asarray(state.acc_loss))
    for a, b in zip(jax.tree_util.tree_leaves(restored.acc_grads),
                    jax.tree_util.tree_leaves(state.acc_grads)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
