"""Full-model wiring and decoder/loss semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from fvp_tpu.geometry.grids import build_rig_constants
from fvp_tpu.models.faster_voxelpose import (
    FasterVoxelPose, compute_losses, match_proposals_to_gt,
)
from tests.helpers import random_rig, tiny_config


def small_cfg(**kw):
    base = dict(
        num_joints=5, num_views=2,
        voxels_per_axis=(16, 16, 8),
        ind_voxels_per_axis=(8, 8, 8),
        heatmap_size=(60, 32),
        image_size=(960, 512),
        max_people=4,
    )
    base.update(kw)
    return tiny_config(**base)


def _random_inputs(rng, cfg):
    rig = random_rig(rng, num_views=cfg.num_views)
    rc = build_rig_constants(cfg, rig)
    w, h = cfg.heatmap_size
    heatmaps = jnp.asarray(
        rng.rand(2, cfg.num_views, cfg.num_joints, h, w).astype(np.float32))
    return rc, heatmaps


def _random_meta(rng, cfg, B):
    G, J = cfg.max_people, cfg.num_joints
    return {
        "roots_3d": jnp.asarray(
            rng.uniform(-2000, 2000, (B, G, 3)).astype(np.float32)),
        "bbox": jnp.asarray(rng.uniform(0.1, 0.9, (B, G, 2)).astype(np.float32)),
        "num_person": jnp.asarray(rng.randint(1, G, (B,))),
        "joints_3d": jnp.asarray(
            rng.uniform(-2000, 2000, (B, G, J, 3)).astype(np.float32)),
        "joints_3d_vis": jnp.asarray(
            (rng.rand(B, G, J) > 0.2).astype(np.float32)),
    }


def test_forward_shapes_eval(rng):
    cfg = small_cfg()
    rc, heatmaps = _random_inputs(rng, cfg)
    model = FasterVoxelPose(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), heatmaps, rc, train=False)
    out = model.apply(variables, heatmaps, rc, train=False)

    B, K, J = 2, cfg.max_people, cfg.num_joints
    assert out["fused_poses"].shape == (B, K, J, 5)
    assert out["plane_poses"].shape == (3, B, K, J, 2)
    assert out["proposals"].shape == (B, K, 7)
    assert out["hm2d"].shape == (B, 16, 16)
    assert out["hm1d"].shape == (B, K, 8)
    assert np.all(np.isfinite(np.asarray(out["fused_poses"])))


def test_forward_train_and_losses(rng):
    cfg = small_cfg()
    rc, heatmaps = _random_inputs(rng, cfg)
    meta = _random_meta(rng, cfg, 2)
    G = cfg.max_people
    targets = {
        "2d_heatmaps": jnp.asarray(rng.rand(2, 16, 16).astype(np.float32)),
        "1d_heatmaps": jnp.asarray(rng.rand(2, G, 8).astype(np.float32)),
        "index": jnp.asarray(rng.randint(0, 256, (2, G))),
        "bbox": jnp.asarray(rng.uniform(0.1, 0.9, (2, G, 2)).astype(np.float32)),
        "mask": jnp.asarray(np.ones((2, G), np.bool_)),
    }
    model = FasterVoxelPose(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), heatmaps, rc, train=False)

    out, new_state = model.apply(
        variables, heatmaps, rc, train=True, meta=meta,
        mutable=["batch_stats"])
    losses = compute_losses(cfg, out, targets, meta)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["total"]) > 0
    assert "batch_stats" in new_state


def _np_match(centers, bbox_preds, gt, gt_bbox, num_person):
    """Literal numpy re-implementation of the reference matching loop
    (human_detection_net.py:53-80) as oracle."""
    K = centers.shape[0]
    p2g = np.zeros(K)
    bbox = bbox_preds.copy()
    gt_v = gt[:num_person]
    dist = np.sqrt(((centers[:, None] - gt_v[None]) ** 2).sum(-1))
    min_gt = dist.argmin(1)
    min_dist = dist.min(1)
    p2g = min_gt.astype(np.float64)
    p2g[min_dist > 500.0] = -1.0
    for k in range(K):
        if p2g[k] < 0:
            continue
        if np.sum(bbox[k] < gt_bbox[int(p2g[k])] - 0.1):
            bbox[k] = gt_bbox[int(p2g[k])]
    return p2g, bbox


def test_match_proposals_semantics(rng):
    K, G = 6, 5
    for num_person in [1, 3, G]:
        centers = rng.uniform(-1000, 1000, (K, 3)).astype(np.float32)
        gt = rng.uniform(-1000, 1000, (G, 3)).astype(np.float32)
        # force some exact matches and some far misses
        gt[0] = centers[0] + 10.0
        centers[1] = gt[min(1, num_person - 1)] + 5000.0
        bbox_preds = rng.uniform(0, 1, (K, 2)).astype(np.float32)
        gt_bbox = rng.uniform(0, 1, (G, 2)).astype(np.float32)

        p2g, adj = match_proposals_to_gt(
            jnp.asarray(centers), jnp.asarray(bbox_preds),
            jnp.asarray(gt), jnp.asarray(gt_bbox),
            jnp.asarray(num_person))
        exp_p2g, exp_bbox = _np_match(centers, bbox_preds, gt, gt_bbox,
                                      num_person)
        np.testing.assert_allclose(np.asarray(p2g), exp_p2g)
        np.testing.assert_allclose(np.asarray(adj), exp_bbox, atol=1e-6)


def test_fusion_matches_reference_math(rng):
    P, J = 3, 5
    coords = rng.uniform(-1000, 1000, (3, P, J, 2)).astype(np.float32)
    weights = rng.uniform(0.01, 1.0, (3, P, J, 1)).astype(np.float32)

    fused = np.asarray(FasterVoxelPose._fuse(
        jnp.asarray(coords), jnp.asarray(weights)))

    # independent numpy rendition of joint_localization_net.py:106-119
    xyw, xzw, yzw = weights
    xy, xz, yz = coords
    xw = np.concatenate([xyw, xzw], 2); xw /= xw.sum(2, keepdims=True)
    yw = np.concatenate([xyw, yzw], 2); yw /= yw.sum(2, keepdims=True)
    zw = np.concatenate([xzw, yzw], 2); zw /= zw.sum(2, keepdims=True)
    x = xw[:, :, :1] * xy[:, :, :1] + xw[:, :, 1:] * xz[:, :, :1]
    y = yw[:, :, :1] * xy[:, :, 1:] + yw[:, :, 1:] * yz[:, :, :1]
    z = zw[:, :, :1] * xz[:, :, 1:] + zw[:, :, 1:] * yz[:, :, 1:]
    expected = np.concatenate([x, y, z], 2)
    np.testing.assert_allclose(fused, expected, atol=1e-4)


def test_losses_match_reference_semantics(rng):
    """Loss normalization parity vs a literal masked-selection emulation of
    faster_voxelpose.py:96-153."""
    cfg = small_cfg()
    B, K, J, Z = 2, cfg.max_people, cfg.num_joints, 8
    nx = ny = 16

    mask = rng.rand(B, K) > 0.4
    if not mask.any():
        mask[0, 0] = True
    p2g = np.where(mask, rng.randint(0, K, (B, K)), -1.0).astype(np.float32)

    outputs = {
        "proposals": jnp.asarray(np.concatenate([
            rng.rand(B, K, 3), p2g[..., None], rng.rand(B, K, 3)], 2
        ).astype(np.float32)),
        "mask": jnp.asarray(mask),
        "hm2d": jnp.asarray(rng.rand(B, nx, ny).astype(np.float32)),
        "hm1d": jnp.asarray(rng.rand(B, K, Z).astype(np.float32)),
        "bbox_flat": jnp.asarray(rng.rand(B, nx * ny, 2).astype(np.float32)),
        "plane_poses": jnp.asarray(
            rng.rand(3, B, K, J, 2).astype(np.float32)),
        "fused_poses": jnp.asarray(rng.rand(B, K, J, 5).astype(np.float32)),
    }
    targets = {
        "2d_heatmaps": jnp.asarray(rng.rand(B, nx, ny).astype(np.float32)),
        "1d_heatmaps": jnp.asarray(rng.rand(B, K, Z).astype(np.float32)),
        "index": jnp.asarray(rng.randint(0, nx * ny, (B, K))),
        "bbox": jnp.asarray(rng.rand(B, K, 2).astype(np.float32)),
        "mask": jnp.asarray(rng.rand(B, K) > 0.3),
    }
    meta = {
        "joints_3d": jnp.asarray(rng.rand(B, K, J, 3).astype(np.float32)),
        "joints_3d_vis": jnp.asarray(
            (rng.rand(B, K, J) > 0.2).astype(np.float32)),
    }

    losses = compute_losses(cfg, outputs, targets, meta)

    o = {k: np.asarray(v) for k, v in outputs.items()}
    t = {k: np.asarray(v) for k, v in targets.items()}
    m = {k: np.asarray(v) for k, v in meta.items()}

    exp_2d = cfg.lambda_loss_2d * np.mean((o["hm2d"] - t["2d_heatmaps"]) ** 2)

    idx = np.maximum(p2g, 0).astype(int)
    matched_1d = np.take_along_axis(t["1d_heatmaps"], idx[:, :, None], 1)
    exp_1d = cfg.lambda_loss_1d * np.mean(
        ((o["hm1d"] - matched_1d)[mask]) ** 2)

    pred_bbox = np.take_along_axis(o["bbox_flat"],
                                   np.asarray(t["index"])[:, :, None], 1)
    exp_bbox = cfg.lambda_loss_bbox * np.mean(
        np.abs(pred_bbox - t["bbox"])[t["mask"]])

    gt_j = np.take_along_axis(m["joints_3d"], idx[:, :, None, None], 1)
    vis = np.take_along_axis(m["joints_3d_vis"], idx[:, :, None], 1)[..., None]
    pl = o["plane_poses"]
    exp_joint = (
        np.mean(np.abs(pl[0] * vis - gt_j[..., 0:2] * vis)[mask])
        + np.mean(np.abs(pl[1] * vis - gt_j[..., ::2] * vis)[mask])
        + np.mean(np.abs(pl[2] * vis - gt_j[..., 1:] * vis)[mask])
        + cfg.lambda_loss_fused * np.mean(
            np.abs(o["fused_poses"][..., :3] * vis - gt_j * vis)[mask])
    )

    np.testing.assert_allclose(float(losses["2d_heatmaps"]), exp_2d, rtol=1e-5)
    np.testing.assert_allclose(float(losses["1d_heatmaps"]), exp_1d, rtol=1e-5)
    np.testing.assert_allclose(float(losses["bbox"]), exp_bbox, rtol=1e-5)
    np.testing.assert_allclose(float(losses["joint"]), exp_joint, rtol=1e-4)
