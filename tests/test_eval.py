"""Evaluator behavior tests: perfect predictions score perfectly, noise
degrades sanely, protocol details (greedy matching, 500mm gates) hold."""

import numpy as np

from fvp_tpu.eval.ap import evaluate_ap_mpjpe
from fvp_tpu.eval.pcp import coco2campus3d, coco2shelf3d, evaluate_pcp


def _fake_frame_preds(gt_list, score=0.9, noise=0.0, rng=None, maxp=10):
    """Pack per-frame GT into the (maxp, J, 5) fused-pose layout."""
    J = gt_list[0].shape[0] if gt_list else 15
    out = np.zeros((maxp, J, 5), np.float32)
    out[:, :, 3] = -1.0
    for i, g in enumerate(gt_list):
        out[i, :, 0:3] = g + (rng.normal(0, noise, g.shape) if noise else 0)
        out[i, :, 3] = 0.0
        out[i, :, 4] = score - 0.01 * i
    return out


def test_ap_perfect_predictions(rng):
    frames = []
    gts = []
    for _ in range(5):
        n = rng.randint(1, 4)
        gt = rng.uniform(-2000, 2000, (n, 15, 3))
        gts.append(gt)
        frames.append(_fake_frame_preds(list(gt), rng=rng))
    preds = np.stack(frames)
    vis = [np.ones((len(g), 15)) for g in gts]
    res = evaluate_ap_mpjpe(preds, gts, vis)
    assert res["mean_ap"] > 0.99
    assert res["mpjpe@500"] < 1e-3
    assert res["recall@500"] > 0.999


def test_ap_degrades_with_noise(rng):
    gts, frames = [], []
    for _ in range(10):
        gt = rng.uniform(-2000, 2000, (2, 15, 3))
        gts.append(gt)
        frames.append(_fake_frame_preds(list(gt), noise=40.0, rng=rng))
    preds = np.stack(frames)
    vis = [np.ones((2, 15)) for _ in gts]
    res = evaluate_ap_mpjpe(preds, gts, vis)
    # ~40mm noise: AP25 low-ish, AP150 ~1, mpjpe near 40*E|N(0,1)| scaled
    assert res["ap"][150] > 0.95
    assert 30.0 < res["mpjpe@500"] < 90.0


def test_ap_false_positives_hurt_precision(rng):
    gt = rng.uniform(-1000, 1000, (1, 15, 3))
    pred = _fake_frame_preds(list(gt), score=0.5, rng=rng)
    # add a confident false positive far away
    pred[1, :, 0:3] = 9000.0
    pred[1, :, 3] = 0.0
    pred[1, :, 4] = 0.99
    res = evaluate_ap_mpjpe(pred[None], [gt], [np.ones((1, 15))])
    assert res["ap"][150] < 0.75   # FP ranked first caps precision


def test_coco2shelf_identity_mapping(rng):
    coco = rng.uniform(-1000, 1000, (17, 3))
    shelf = coco2shelf3d(coco.copy())
    # direct-mapped limbs (shelf.py:237): shelf[0] = coco[16] (r-ankle) etc.
    np.testing.assert_allclose(shelf[0], coco[16])
    np.testing.assert_allclose(shelf[5], coco[15])
    np.testing.assert_allclose(shelf[8], coco[6])
    np.testing.assert_allclose(shelf[11], coco[9])
    campus = coco2campus3d(coco.copy())
    np.testing.assert_allclose(campus[:12], shelf[:12])
    # campus head joints are the pure interpolations
    mid_sho = (coco[5] + coco[6]) / 2
    head_center = (coco[3] + coco[4]) / 2
    head_bottom = (mid_sho + head_center) / 2
    np.testing.assert_allclose(campus[12], head_bottom)
    np.testing.assert_allclose(campus[13], head_bottom
                               + (head_center - head_bottom) * 2)


def test_pcp_perfect_is_100(rng):
    frames = 4
    gt_by_actor = [[rng.uniform(-1000, 1000, (14, 3)) for _ in range(frames)]
                   for _ in range(3)]
    preds = np.zeros((frames, 10, 14, 5), np.float32)
    preds[:, :, :, 3] = -1.0
    for f in range(frames):
        for a in range(3):
            preds[f, a, :, 0:3] = gt_by_actor[a][f]
            preds[f, a, :, 3] = 0.0
            preds[f, a, :, 4] = 0.9
    res = evaluate_pcp(preds, gt_by_actor, convert=lambda p: p)
    assert res["avg_pcp"] > 0.999
    assert res["recall@500"] > 0.999


def test_synthetic_heldout_split_and_evaluator():
    """The synthetic test split must be scene-disjoint from train (different
    seed) and expose the Panoptic AP/MPJPE protocol on its own GT."""
    from fvp_tpu.config import FVPConfig
    from fvp_tpu.data.registry import build_dataset

    cfg = FVPConfig(num_views=3, synthetic_num_data=4,
                    synthetic_max_people=2)
    train = build_dataset("synthetic", cfg, is_train=True)
    test = build_dataset("synthetic", cfg, is_train=False)

    assert not train.has_evaluate_function
    assert test.has_evaluate_function
    tr0 = np.concatenate([j.ravel() for r in train.records
                          for j in r["joints_3d"]])
    te0 = np.concatenate([j.ravel() for r in test.records
                          for j in r["joints_3d"]])
    assert tr0.shape != te0.shape or not np.allclose(tr0, te0)

    # feeding the GT back as predictions scores (near-)perfect
    K, J = cfg.max_people, cfg.num_joints
    preds = np.zeros((len(test), K, J, 5), np.float32)
    preds[:, :, :, 3] = -1.0
    for i, rec in enumerate(test.records):
        for n, pose in enumerate(rec["joints_3d"]):
            preds[i, n, :, 0:3] = pose
            preds[i, n, :, 3] = n
            preds[i, n, :, 4] = 0.9
    m = test.evaluate(preds)
    assert m["mpjpe@500"] < 1e-3
    assert m["ap"][25] > 0.99
