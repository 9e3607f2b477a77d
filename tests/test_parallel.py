"""Multi-device sharding tests on the 8-device virtual CPU mesh:
data x view parallel train/eval must agree numerically with single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from fvp_tpu.data.loader import collate
from fvp_tpu.data.synthetic import SyntheticDataset
from fvp_tpu.engine.train import create_train_state, make_train_step
from fvp_tpu.geometry.grids import build_rig_constants
from fvp_tpu.models.faster_voxelpose import FasterVoxelPose
from fvp_tpu.parallel.mesh import make_mesh, pick_mesh_shape
from fvp_tpu.parallel.sharding import (
    make_sharded_eval_step, make_sharded_train_step,
)
from tests.helpers import random_rig, tiny_config


def par_cfg():
    return tiny_config(
        num_joints=15, num_views=2,
        heatmap_size=(60, 32),
        voxels_per_axis=(32, 32, 8),
        ind_voxels_per_axis=(16, 16, 16),
        max_people=4,
        train_heatmap_src="gt",
        test_heatmap_src="gt",
        synthetic_max_people=2,
        synthetic_num_data=4,
        synthetic_augmentation=False,
        accumulation_steps=2,
    )


def test_pick_mesh_shape():
    assert pick_mesh_shape(8, num_views=2) == (4, 2)
    assert pick_mesh_shape(8, num_views=5) == (8, 1)
    assert pick_mesh_shape(4, num_views=4) == (1, 4)
    assert pick_mesh_shape(6, num_views=3) == (2, 3)


def _setup(rng):
    cfg = par_cfg()
    rig = random_rig(rng, num_views=cfg.num_views)
    ds = SyntheticDataset(cfg, rig, seed=5)
    rc = build_rig_constants(cfg, rig)
    model = FasterVoxelPose(cfg=cfg)
    batch = collate([ds.sample(i, rng=np.random.RandomState(i))
                     for i in range(4)])
    heatmaps = jnp.asarray(batch["input_heatmaps"])
    targets = jax.tree_util.tree_map(jnp.asarray, batch["targets"])
    meta = jax.tree_util.tree_map(jnp.asarray, batch["meta"])
    return cfg, model, rc, heatmaps, targets, meta


def test_sharded_train_matches_single_device(rng):
    assert len(jax.devices()) >= 8
    cfg, model, rc, heatmaps, targets, meta = _setup(rng)

    state0 = create_train_state(cfg, model, rc, heatmaps,
                                jax.random.PRNGKey(0))
    # make_train_step donates the state buffers; keep a copy for the
    # sharded run
    state0_copy = jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                         state0)
    single = make_train_step(cfg, model)
    s_ref, losses_ref = single(state0, heatmaps, rc, targets, meta)
    state0 = state0_copy

    mesh = make_mesh(4, 2)
    with mesh:
        sharded = make_sharded_train_step(cfg, model, mesh)
        s_par, losses_par = sharded(state0, heatmaps, rc, targets, meta)

    for k in losses_ref:
        np.testing.assert_allclose(float(losses_ref[k]),
                                   float(losses_par[k]),
                                   rtol=2e-3, atol=1e-5)
    ref_leaves = jax.tree_util.tree_leaves(s_ref.params)
    par_leaves = jax.tree_util.tree_leaves(s_par.params)
    for a, b in zip(ref_leaves, par_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-4)


def test_sharded_eval_matches_single_device(rng):
    cfg, model, rc, heatmaps, _, _ = _setup(rng)
    variables = model.init(jax.random.PRNGKey(0), heatmaps, rc, train=False)

    ref = model.apply(variables, heatmaps, rc, train=False)["fused_poses"]

    mesh = make_mesh(2, 2)
    with mesh:
        step = make_sharded_eval_step(cfg, model, mesh)
        par = step(variables, heatmaps, rc)

    np.testing.assert_allclose(np.asarray(ref), np.asarray(par),
                               rtol=1e-3, atol=2e-3)
