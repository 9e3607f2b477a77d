"""Service components: overlay rendering, frame preprocessing, restream
degradation, and calibration-driven camera setup — the host-side pieces of
the streaming pipeline (reference run/service.py:57-138, 258-339, 677-697)
testable without any stream or device."""

import json

import numpy as np
import pytest

from fvp_tpu.geometry.transforms import get_resize_transform
from fvp_tpu.service.pipeline import (
    ServiceConfig, _frames_to_heatmaps, _frames_to_images, _service_rig,
    pick_view_shards, run_service,
)
from fvp_tpu.service.render import (
    FFmpegRestream, compose_views, render_result_on_image,
)
from tests.helpers import random_rig, tiny_config

cv2 = pytest.importorskip("cv2")


def test_compose_and_render_overlay(rng):
    cfg = tiny_config(num_views=4, min_score=0.3)
    rig = random_rig(rng, num_views=4)
    views = [np.full((270, 480, 3), 40 * (v + 1), np.uint8)
             for v in range(4)]
    img = compose_views(views, cfg.image_size)
    assert img.shape == (cfg.image_size[1], cfg.image_size[0], 3)

    # one confident person standing at the space center + one non-detection
    poses = np.zeros((cfg.max_people, cfg.num_joints, 5), np.float32)
    poses[:, :, 3] = -1.0
    poses[0, :, :3] = np.asarray(cfg.space_center) + rng.randn(
        cfg.num_joints, 3) * 150
    poses[0, :, 3] = 0.0
    poses[0, :, 4] = 0.9
    before = img.copy()
    resize_t = get_resize_transform(cfg.ori_image_size, cfg.image_size)
    out = render_result_on_image(cfg, rig, resize_t, img, poses,
                                 fps=30.0, latency_ms=12.0)
    assert out.shape == before.shape
    assert (out != before).any()          # something was drawn


def test_frames_to_images_normalization():
    cfg = tiny_config(num_views=2, image_size=(320, 160))
    views = [np.full((100, 200, 3), 128, np.uint8) for _ in range(2)]
    x = _frames_to_images(cfg, views)
    assert x.shape == (1, 2, 160, 320, 3)
    # (128/255 - mean) / std for the red channel
    np.testing.assert_allclose(
        x[0, 0, 0, 0, 0], (128 / 255.0 - 0.485) / 0.229, atol=1e-4)


def test_frames_to_heatmaps_shape():
    cfg = tiny_config(num_views=3)
    views = [np.zeros((120, 160, 3), np.uint8) for _ in range(3)]
    hm = _frames_to_heatmaps(cfg, views)
    w, h = cfg.heatmap_size
    assert hm.shape == (1, 3, cfg.num_joints, h, w)


def test_restream_degrades_without_ffmpeg(monkeypatch, tmp_path):
    """On hosts without ffmpeg the restream must become a warning no-op."""
    monkeypatch.setenv("PATH", str(tmp_path))   # hide any ffmpeg
    w = FFmpegRestream("rtsp://localhost/x", (64, 64), fps=5.0)
    assert w.dead
    w.write(np.zeros((64, 64, 3), np.uint8))    # must not raise
    w.close()


def test_pick_view_shards():
    """Serving shards the camera axis with the largest divisor of the view
    count that fits the device pool; leftover devices idle (batch is 1)."""
    assert pick_view_shards(1, 5) == 1       # single device -> no sharding
    assert pick_view_shards(8, 5) == 5       # 5 views on 8 devices
    assert pick_view_shards(4, 5) == 1       # 5 is prime; 4 devices can't
    assert pick_view_shards(4, 4) == 4
    assert pick_view_shards(3, 4) == 2       # largest divisor <= 3
    assert pick_view_shards(8, 6) == 6


def test_service_end_to_end_sharded(monkeypatch, tmp_path):
    """Full service topology on a 2-device virtual CPU mesh: synthetic
    source -> view-sharded jitted inference -> overlay render -> JPEG save
    (reference run/service.py:720-827), stopping itself after max_frames."""
    cfg = tiny_config(num_views=2, heatmap_size=(60, 32),
                      voxels_per_axis=(16, 16, 8),
                      ind_voxels_per_axis=(8, 8, 8), max_people=3)
    monkeypatch.setenv("FVP_PLATFORM", "cpu")
    monkeypatch.setenv("FVP_CPU_DEVICES", "2")
    out = tmp_path / "svc"
    run_service(ServiceConfig(num_views=2, max_frames=2, view_mode="save",
                              output_dir=str(out), target_fps=10.0,
                              cfg_obj=cfg))
    assert len(list(out.glob("pose_*.jpg"))) >= 1


def test_service_rig_from_calibration(tmp_path, rng):
    """_service_rig must rebuild the rig from a custom-format calibration
    file (k intrinsics, d distortion, p 3x4 projection)."""
    rig = random_rig(rng, num_views=2)
    calib = {}
    for c in range(2):
        cam = rig.camera(c)
        K = np.array([[cam["fx"], 0, cam["cx"]],
                      [0, cam["fy"], cam["cy"]], [0, 0, 1]])
        R = np.asarray(cam["R"])
        T = np.asarray(cam["T"]).reshape(3, 1)
        P = K @ np.hstack([R, -R @ T])
        k = np.asarray(cam["k"]).ravel()
        p = np.asarray(cam["p"]).ravel()
        calib[f"cam{c}"] = {
            "k": [float(cam["fx"]), float(cam["fy"]),
                  float(cam["cx"]), float(cam["cy"])],
            "d": [float(k[0]), float(k[1]), float(p[0]), float(p[1]),
                  float(k[2])],
            "p": P.ravel().tolist(),
        }
    path = tmp_path / "calibration.json"
    path.write_text(json.dumps(calib))

    cfg = tiny_config(num_views=2)
    svc = ServiceConfig(calibration=str(path), num_views=2)
    got = _service_rig(svc, cfg)
    assert got.num_cameras == 2
    for c in range(2):
        a, b = got.camera(c), rig.camera(c)
        np.testing.assert_allclose(np.asarray(a["R"]), np.asarray(b["R"]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(a["T"]), np.asarray(b["T"]),
                                   atol=1e-3)
