"""Camera projection parity: jnp implementation vs numpy oracle vs the
reference repo's own CPU implementation (loaded directly from
/root/reference/lib/utils/cameras.py when available)."""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

from fvp_tpu.geometry.cameras import (
    CameraRig, project_points, project_points_np, project_points_rig,
)
from tests.helpers import random_rig

REF_CAMERAS = "/root/reference/lib/utils/cameras.py"


def _load_reference_cameras():
    spec = importlib.util.spec_from_file_location("ref_cameras", REF_CAMERAS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _random_points(rng, n=500):
    return np.stack([
        rng.uniform(-4000, 4000, n),
        rng.uniform(-4500, 4000, n),
        rng.uniform(-200, 2000, n),
    ], axis=1)


def test_jnp_matches_numpy_oracle(rng):
    rig = random_rig(rng, num_views=4)
    pts = _random_points(rng)
    for v in range(rig.num_cameras):
        cam = rig.camera(v)
        # compare at matched (f32) precision: the distortion polynomial
        # amplifies rounding wildly for far-off-axis points, so an f64
        # oracle would measure precision, not correctness
        ref = project_points_np(pts, cam, dtype=np.float32)
        got = project_points(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(rig.R[v], jnp.float32),
            jnp.asarray(rig.T[v], jnp.float32),
            jnp.asarray(rig.f[v], jnp.float32),
            jnp.asarray(rig.c[v], jnp.float32),
            jnp.asarray(rig.k[v], jnp.float32),
            jnp.asarray(rig.p[v], jnp.float32),
        )
        ref64 = project_points_np(pts, cam, dtype=np.float64)
        sane = np.all(np.abs(ref64) < 5000.0, axis=1)   # near-frustum points
        assert sane.sum() > 100
        scale = np.maximum(1.0, np.abs(ref[sane]))
        err = np.abs(np.asarray(got)[sane] - ref[sane]) / scale
        assert err.max() < 1e-3, err.max()


def test_rig_vmap_consistent(rng):
    rig = random_rig(rng, num_views=3).astype(np.float32)
    pts = _random_points(rng, 64)
    all_v = np.asarray(project_points_rig(jnp.asarray(pts, jnp.float32), rig))
    for v in range(3):
        ref = project_points_np(pts, rig.camera(v), dtype=np.float32)
        ref64 = project_points_np(pts, rig.camera(v), dtype=np.float64)
        sane = np.all(np.abs(ref64) < 5000.0, axis=1)
        scale = np.maximum(1.0, np.abs(ref[sane]))
        err = np.abs(all_v[v][sane] - ref[sane]) / scale
        assert err.max() < 1e-3, err.max()


@pytest.mark.skipif(not os.path.exists(REF_CAMERAS),
                    reason="reference repo not mounted")
def test_matches_reference_implementation(rng):
    ref_mod = _load_reference_cameras()
    rig = random_rig(rng, num_views=2)
    pts = _random_points(rng, 200)
    for v in range(2):
        cam = rig.camera(v)
        expected = ref_mod.project_pose_cpu(pts, cam)
        ours = project_points_np(pts, cam)
        np.testing.assert_allclose(ours, expected, rtol=1e-10, atol=1e-8)


def test_from_dicts_roundtrip(rng):
    rig = random_rig(rng, num_views=2)
    rig2 = CameraRig.from_dicts([rig.camera(0), rig.camera(1)])
    np.testing.assert_allclose(rig2.R, rig.R)
    np.testing.assert_allclose(rig2.T, rig.T)
    np.testing.assert_allclose(rig2.k, rig.k)
