"""Affine transform parity vs cv2.getAffineTransform-based reference math
(loaded from the reference repo when available, which needs cv2)."""

import importlib.util
import os

import numpy as np
import pytest

from fvp_tpu.geometry.transforms import (
    affine_apply, get_affine_transform, get_resize_transform, get_scale,
    rotate_points,
)

REF_TRANSFORMS = "/root/reference/lib/utils/transforms.py"


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_transforms",
                                                  REF_TRANSFORMS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _has_cv2():
    try:
        import cv2  # noqa: F401
        return True
    except Exception:
        return False


@pytest.mark.skipif(not (os.path.exists(REF_TRANSFORMS) and _has_cv2()),
                    reason="reference repo or cv2 unavailable")
def test_affine_matches_reference(rng):
    ref = _load_ref()
    for _ in range(10):
        center = rng.uniform(0, 1000, 2)
        scale = rng.uniform(1, 10, 2)
        rot = rng.uniform(-90, 90)
        out_size = (int(rng.randint(100, 1000)), int(rng.randint(100, 1000)))
        expected = ref.get_affine_transform(center, scale, rot, out_size)
        got = get_affine_transform(center, scale, rot, out_size)
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not (os.path.exists(REF_TRANSFORMS) and _has_cv2()),
                    reason="reference repo or cv2 unavailable")
def test_resize_transform_matches_reference():
    ref = _load_ref()
    for ori, new in [((1920, 1080), (960, 512)), ((1032, 776), (800, 608)),
                     ((360, 288), (800, 640))]:
        c = np.array([ori[0] / 2.0, ori[1] / 2.0])
        s = ref.get_scale(ori, new)
        expected = ref.get_affine_transform(c, s, 0, new)
        got = get_resize_transform(ori, new)
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_scale_aspect_preserving():
    s = get_scale((1920, 1080), (960, 512))
    # height is the limiting axis here: width gets padded to keep aspect
    assert s[0] * 200.0 == pytest.approx(1080.0 / 512 * 960)
    assert s[1] * 200.0 == pytest.approx(1080.0)


def test_affine_apply_identity():
    t = np.array([[1.0, 0.0, 5.0], [0.0, 1.0, -3.0]])
    pts = np.array([[1.0, 2.0], [0.0, 0.0]])
    out = affine_apply(pts, t)
    np.testing.assert_allclose(out, [[6.0, -1.0], [5.0, -3.0]])


def test_rotate_points_roundtrip(rng):
    pts = rng.uniform(-100, 100, (7, 2))
    center = rng.uniform(-10, 10, 2)
    out = rotate_points(rotate_points(pts, center, 37.0), center, -37.0)
    np.testing.assert_allclose(out, pts, atol=1e-9)
