"""On-device heatmap renderer (ops/heatmap_render.py) parity vs the numpy
reference implementation (data/heatmaps.py), clean and augmented."""

import numpy as np

from fvp_tpu.config import FVPConfig
from fvp_tpu.data.heatmaps import compute_human_scale, generate_input_heatmap
from fvp_tpu.ops.heatmap_render import render_heatmaps_device
from tests.helpers import tiny_config


def _pack(cfg, joints, vis, scale=None, occ=None):
    """Pack one view's people into the device renderer's payload (the
    arithmetic mirrors PoseDataset.pack_render_params)."""
    P, J = cfg.max_people, cfg.num_joints
    stride = (np.asarray(cfg.image_size, np.float64)
              / np.asarray(cfg.heatmap_size, np.float64))
    mu = np.zeros((P, J, 2), np.int32)
    vv = np.zeros((P, J), np.float32)
    sg = np.zeros((P,), np.float32)
    sc = np.ones((P, J), np.float32) if scale is None else scale
    oc = np.zeros((P, J, 4), np.int32) if occ is None else occ
    for n, pose in enumerate(joints[:P]):
        pose = np.asarray(pose, np.float64)[:, :2]
        hs = 2.0 * compute_human_scale(pose / stride, np.ones(J))
        if hs == 0.0:
            continue
        sg[n] = cfg.sigma * np.sqrt(hs / (96.0 * 96.0))
        mu[n] = np.trunc(pose / stride).astype(np.int32)
        vv[n] = np.asarray(vis[n] if vis is not None else np.ones(J),
                           np.float32)
    return mu, vv, sg, sc, oc


def test_device_render_matches_numpy_clean(rng):
    cfg = tiny_config(sigma=3.0)
    J = cfg.num_joints
    for _ in range(4):
        n_people = rng.randint(1, cfg.max_people + 1)
        joints = [np.stack([
            rng.uniform(-80, cfg.image_size[0] + 80, J),
            rng.uniform(-80, cfg.image_size[1] + 80, J)], 1)
            for _ in range(n_people)]
        vis = [(rng.rand(J) > 0.2).astype(np.float64)
               for _ in range(n_people)]

        ref = generate_input_heatmap(cfg, joints, joints_vis=vis,
                                     augment=False)
        dev = np.asarray(render_heatmaps_device(
            cfg, *map(np.asarray, _pack(cfg, joints, vis))))
        np.testing.assert_allclose(dev, ref, atol=1e-5)


def test_device_render_matches_numpy_augmented(rng):
    """Identical pre-drawn augmentation fed to both implementations."""
    cfg = tiny_config(sigma=3.0)
    J = cfg.num_joints
    hm_w, hm_h = cfg.heatmap_size
    P = cfg.max_people
    n_people = 3
    joints = [np.stack([
        rng.uniform(0, cfg.image_size[0], J),
        rng.uniform(0, cfg.image_size[1], J)], 1)
        for _ in range(n_people)]
    vis = [np.ones(J) for _ in range(n_people)]

    scale = np.ones((P, J), np.float32)
    occ = np.zeros((P, J, 4), np.int32)
    for n in range(n_people):
        for j in range(J):
            scale[n, j] = 0.5 + 0.5 * rng.rand()
            y0 = rng.randint(0, hm_h - 1)
            x0 = rng.randint(0, hm_w - 1)
            occ[n, j] = (y0, min(y0 + rng.randint(4, hm_h), hm_h),
                         x0, min(x0 + rng.randint(4, hm_w), hm_w))

    ref = generate_input_heatmap(cfg, joints, joints_vis=vis, augment=True,
                                 draws=(scale, occ))
    dev = np.asarray(render_heatmaps_device(
        cfg, *map(np.asarray, _pack(cfg, joints, vis, scale, occ))))
    np.testing.assert_allclose(dev, ref, atol=1e-5)


def test_device_render_end_to_end_sample(rng):
    """device_render=True datasets produce render_params whose device
    rendering matches the host-rendered input_heatmaps of the same
    device_render=False dataset (no augmentation => deterministic)."""
    from fvp_tpu.data.registry import build_dataset

    base = dict(num_views=3, synthetic_num_data=2, synthetic_max_people=2,
                synthetic_augmentation=False, train_heatmap_src="gt",
                test_heatmap_src="gt")
    cfg_host = FVPConfig(**base)
    cfg_dev = FVPConfig(device_render=True, **base)
    ds_host = build_dataset("synthetic", cfg_host, is_train=True)
    ds_dev = build_dataset("synthetic", cfg_dev, is_train=True)

    for i in range(2):
        s_host = ds_host.sample(i, rng=np.random.RandomState(7))
        s_dev = ds_dev.sample(i, rng=np.random.RandomState(7))
        rp = s_dev["render_params"]
        hm = np.asarray(render_heatmaps_device(
            cfg_dev, rp["mu"], rp["vis"], rp["sigma"], rp["scale"],
            rp["occ"]))
        np.testing.assert_allclose(hm, s_host["input_heatmaps"], atol=1e-5)
