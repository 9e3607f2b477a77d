"""End-to-end slice: synthetic scenes -> GT heatmaps -> full pipeline ->
training steps reduce the loss; eval loop produces well-formed poses.

This is the framework analog of the reference's no-image 'gt'-source path
(the mock-backbone fixture, SURVEY.md §4) on a shrunken capture space.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fvp_tpu.data.loader import batch_iterator, collate
from fvp_tpu.data.synthetic import SyntheticDataset
from fvp_tpu.data.targets import generate_target
from fvp_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
from fvp_tpu.engine.train import create_train_state, make_train_step
from fvp_tpu.engine.validate import run_validation
from fvp_tpu.eval.ap import evaluate_ap_mpjpe
from fvp_tpu.geometry.grids import build_rig_constants
from fvp_tpu.models.faster_voxelpose import FasterVoxelPose
from tests.helpers import random_rig, tiny_config


def e2e_cfg(**kw):
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
        synthetic_num_data=8,
        synthetic_augmentation=False,
        batch_size=2,
        lr=2e-3,
        accumulation_steps=2,
    )
    base.update(kw)
    return tiny_config(**base)


def _dataset(rng, cfg, **kw):
    rig = random_rig(rng, num_views=cfg.num_views)
    ds = SyntheticDataset(cfg, rig, seed=3, **kw)
    return ds, rig


def test_synthetic_dataset_samples(rng):
    cfg = e2e_cfg()
    ds, _ = _dataset(rng, cfg)
    s = ds.sample(0, rng=np.random.RandomState(0))
    V, J = cfg.num_views, cfg.num_joints
    w, h = cfg.heatmap_size
    assert s["input_heatmaps"].shape == (V, J, h, w)
    assert s["targets"]["2d_heatmaps"].shape == (32, 32)
    assert s["meta"]["joints_3d"].shape == (cfg.max_people, J, 3)
    assert 0 < s["meta"]["num_person"] <= cfg.synthetic_max_people
    assert s["input_heatmaps"].max() > 0.5   # people actually visible
    # the BEV target has a peak where someone stands
    assert s["targets"]["2d_heatmaps"].max() > 0.9


def test_training_reduces_loss(rng):
    cfg = e2e_cfg()
    ds, rig = _dataset(rng, cfg)
    rc = build_rig_constants(cfg, rig)
    model = FasterVoxelPose(cfg=cfg)

    batch = collate([ds.sample(i, rng=np.random.RandomState(i))
                     for i in range(cfg.batch_size)])
    heatmaps = jnp.asarray(batch["input_heatmaps"])
    state = create_train_state(cfg, model, rc, heatmaps,
                               jax.random.PRNGKey(0))
    step = make_train_step(cfg, model)

    targets = jax.tree_util.tree_map(jnp.asarray, batch["targets"])
    meta = jax.tree_util.tree_map(jnp.asarray, batch["meta"])

    first = None
    last = None
    for i in range(30):
        state, losses = step(state, heatmaps, rc, targets, meta)
        tot = float(losses["total"])
        assert np.isfinite(tot)
        if first is None:
            first = float(losses["2d_heatmaps"])
        last = float(losses["2d_heatmaps"])
    # BEV heatmap loss must fall markedly when overfitting one batch
    assert last < first * 0.7, (first, last)
    assert int(state.step) == 30


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = e2e_cfg(synthetic_num_data=2)
    ds, rig = _dataset(rng, cfg)
    rc = build_rig_constants(cfg, rig)
    model = FasterVoxelPose(cfg=cfg)
    batch = collate([ds.sample(0)])
    heatmaps = jnp.asarray(batch["input_heatmaps"])
    state = create_train_state(cfg, model, rc, heatmaps,
                               jax.random.PRNGKey(1))

    save_checkpoint(str(tmp_path), state, epoch=3, best_metric=0.5,
                    is_best=True)
    restored, epoch, best = load_checkpoint(str(tmp_path), state)
    assert epoch == 3 and best == 0.5
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_validation_loop_and_evaluator(rng):
    cfg = e2e_cfg(synthetic_num_data=4, test_batch_size=2)
    ds, rig = _dataset(rng, cfg)
    rc = build_rig_constants(cfg, rig)
    model = FasterVoxelPose(cfg=cfg)
    batch = collate([ds.sample(0)])
    heatmaps = jnp.asarray(batch["input_heatmaps"])
    variables = model.init(jax.random.PRNGKey(0), heatmaps, rc, train=False)

    res = run_validation(cfg, model, variables, ds, rc,
                         log=lambda *_: None)
    assert res["fused_poses"].shape == (4, cfg.max_people, cfg.num_joints, 5)
    # evaluator machinery runs on whatever (probably empty) detections exist
    gts = [[p for p in ds.records[i]["joints_3d"]] for i in range(4)]
    vis = [[v for v in ds.records[i]["joints_3d_vis"]] for i in range(4)]
    gts = [np.asarray(g) for g in gts]
    vis = [np.asarray(v) for v in vis]
    metrics = evaluate_ap_mpjpe(res["fused_poses"], gts, vis)
    assert 0.0 <= metrics["mean_ap"] <= 1.0
