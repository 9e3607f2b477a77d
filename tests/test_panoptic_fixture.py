"""Panoptic real-file loader fixture: synthesize a minimal on-disk CMU
Panoptic tree (calibration JSON in the real schema, hdPose3d/hdImgs
layout) and drive load -> rig -> db index -> meta cache -> sample ->
evaluate — the code that runs first the day real data appears
(reference: lib/dataset/panoptic.py:91-205)."""

import json
import os

import numpy as np

from fvp_tpu.data.panoptic import (
    CAM_LIST, M_AXES, PanopticDataset, load_panoptic_calibration,
)
from tests.helpers import tiny_config

SEQ = "160906_pizza1"          # a real VAL_LIST sequence name
NUM_VIEWS = 3
J = 15


def _cfg(tmp_path):
    return tiny_config(
        num_joints=J, num_views=NUM_VIEWS,
        data_dir=str(tmp_path),
        ori_image_size=(1920, 1080), image_size=(960, 512),
        heatmap_size=(120, 64),
        space_size=(8000.0, 8000.0, 2000.0),
        space_center=(0.0, 0.0, 800.0),
        voxels_per_axis=(32, 32, 8),
        ind_voxels_per_axis=(16, 16, 16),
        ind_space_size=(2000.0, 2000.0, 2000.0),
        max_people=4,
        test_heatmap_src="gt", train_heatmap_src="gt",
    )


def _world_camera(idx):
    """Ring camera at 4 m radius looking at (0, 0, 800) mm, z-up world."""
    center = np.array([0.0, 0.0, 800.0])
    ang = 2 * np.pi * idx / 5
    pos = center + np.array([4000 * np.cos(ang), 4000 * np.sin(ang), 1200])
    z = center - pos
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 0.0, -1.0])
    x = np.cross(z, up)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R_w = np.stack([x, y, z])              # rows = camera axes
    return R_w, pos                        # pos = T (mm, world)


def _write_tree(tmp_path, n_frames=13, n_people=2):
    seq_dir = tmp_path / SEQ
    anno_dir = seq_dir / "hdPose3d_stage1_coco19"
    anno_dir.mkdir(parents=True)

    # calibration in the real schema: the loader maps R_json -> R_json@M,
    # T = -(R_json@M)^T t * 10 (data/panoptic.py:62-74), so invert that
    # from the desired world-frame cameras
    cams = []
    for k, (panel, node) in enumerate(CAM_LIST):
        R_w, T_mm = _world_camera(k)
        R_json = R_w @ M_AXES.T
        t_cm = (-R_w @ T_mm / 10.0).reshape(3, 1)
        cams.append({
            "panel": panel, "node": node,
            "name": f"{panel:02d}_{node:02d}", "type": "hd",
            "K": [[1400.0, 0.0, 960.0], [0.0, 1400.0, 540.0],
                  [0.0, 0.0, 1.0]],
            "distCoef": [-0.2, 0.1, 1e-3, -1e-3, 0.05],
            "R": R_json.tolist(),
            "t": t_cm.tolist(),
        })
    with open(seq_dir / f"calibration_{SEQ}.json", "w") as f:
        json.dump({"calibDataSource": "test", "cameras": cams}, f)

    # GT bodies: joints19 is cm, y-up; the loader keeps the first
    # num_joints rows and applies xyz @ M * 10
    rng = np.random.RandomState(7)
    gt_mm = {}
    for i in range(n_frames):
        bodies = []
        poses = []
        for p in range(n_people):
            base = np.array([800.0 * p - 400.0, 300.0 * p, 900.0])
            pose_mm = base + rng.uniform(-250, 250, (J, 3))
            poses.append(pose_mm)
            pose_cm_yup = (pose_mm @ M_AXES.T) / 10.0
            j19 = np.zeros((19, 4))
            j19[:J, :3] = pose_cm_yup
            j19[:J, 3] = 0.9               # confidence > 0.1 at the root
            bodies.append({"id": p, "joints19": j19.ravel().tolist()})
        with open(anno_dir / f"body3DScene_{i:08d}.json", "w") as f:
            json.dump({"version": 1.0, "bodies": bodies}, f)
        gt_mm[i] = poses

    # image files must EXIST for a frame to be indexed (loader checks
    # os.path.exists; gt-source sampling never reads the pixels)
    for k in range(NUM_VIEWS):
        prefix = "{:02d}_{:02d}".format(*CAM_LIST[k])
        img_dir = seq_dir / "hdImgs" / prefix
        img_dir.mkdir(parents=True)
        for i in range(n_frames):
            (img_dir / f"{prefix}_{i:08d}.jpg").touch()
    return gt_mm


def test_calibration_loader_roundtrip(tmp_path):
    _write_tree(tmp_path)
    rig = load_panoptic_calibration(
        str(tmp_path / SEQ / f"calibration_{SEQ}.json"),
        CAM_LIST[:NUM_VIEWS])
    assert rig.num_cameras == NUM_VIEWS
    for k in range(NUM_VIEWS):
        R_w, T_mm = _world_camera(k)
        cam = rig.camera(k)
        np.testing.assert_allclose(cam["R"], R_w, atol=1e-10)
        np.testing.assert_allclose(cam["T"].ravel(), T_mm, atol=1e-6)
        assert float(cam["fx"]) == 1400.0
        # distCoef [k1,k2,p1,p2,k3] -> k=(k1,k2,k3), p=(p1,p2)
        np.testing.assert_allclose(np.asarray(cam["k"]).ravel(),
                                   [-0.2, 0.1, 0.05])
        np.testing.assert_allclose(np.asarray(cam["p"]).ravel(),
                                   [1e-3, -1e-3])


def test_panoptic_dataset_end_to_end(tmp_path):
    gt_mm = _write_tree(tmp_path)
    cfg = _cfg(tmp_path)
    ds = PanopticDataset(cfg, is_train=False, sequences=[SEQ])

    # eval interval 12 over 13 frames -> frames 0 and 12
    assert len(ds.records) == 2
    assert ds.records[0]["seq"] == SEQ
    assert len(ds.records[0]["image_paths"]) == NUM_VIEWS

    # y-up cm -> z-up mm round trip of the GT
    got = np.asarray(ds.records[0]["joints_3d"])
    np.testing.assert_allclose(got, np.asarray(gt_mm[0]), atol=1e-9)

    # meta cache: second construction loads the pickle (delete the annos
    # to prove the cache is the source)
    assert os.path.exists(tmp_path / "validation_meta_fvp.pkl")
    for f in (tmp_path / SEQ / "hdPose3d_stage1_coco19").iterdir():
        f.unlink()
    ds2 = PanopticDataset(cfg, is_train=False, sequences=[SEQ])
    assert len(ds2.records) == 2
    np.testing.assert_allclose(
        np.asarray(ds2.records[1]["joints_3d"]),
        np.asarray(ds.records[1]["joints_3d"]))

    # sample(): gt-source heatmaps render from the synthesized calibration
    s = ds.sample(0, rng=np.random.RandomState(0))
    hm = s["input_heatmaps"]
    assert hm.shape == (NUM_VIEWS, J, 64, 120)
    assert np.isfinite(hm).all()
    assert hm.max() > 0.5                  # people are inside the views
    assert s["meta"]["num_person"] == 2
    assert s["targets"]["2d_heatmaps"].shape == (32, 32)

    # evaluate(): feeding back the GT as predictions scores perfectly
    preds = np.zeros((2, cfg.max_people, J, 5), np.float32)
    preds[:, :, :, 3] = -1.0
    for i in range(2):
        for p, g in enumerate(ds.records[i]["joints_3d"]):
            preds[i, p, :, 0:3] = g
            preds[i, p, :, 3] = 1.0
            preds[i, p, :, 4] = 0.95
    res = ds.evaluate(preds)
    assert res["mean_ap"] > 0.99
    assert res["mpjpe@500"] < 1e-3
