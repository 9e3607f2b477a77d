"""Native C++ heatmap renderer parity vs the numpy implementation."""

import numpy as np
import pytest

from fvp_tpu.data.heatmaps import generate_input_heatmap
from fvp_tpu.data.native import generate_input_heatmap_native, get_lib
from tests.helpers import tiny_config


@pytest.mark.skipif(get_lib() is None, reason="native toolchain unavailable")
def test_native_matches_numpy(rng):
    cfg = tiny_config(sigma=3.0)
    for trial in range(5):
        n_people = rng.randint(1, 5)
        joints = [np.stack([
            rng.uniform(-50, cfg.image_size[0] + 50, 17),
            rng.uniform(-50, cfg.image_size[1] + 50, 17),
        ], 1) for _ in range(n_people)]
        vis = [rng.rand(17) > 0.2 for _ in range(n_people)]

        ref = generate_input_heatmap(cfg, joints, joints_vis=vis,
                                     augment=False)
        native = generate_input_heatmap_native(cfg, joints, vis)
        assert native is not None
        assert native.shape == ref.shape
        np.testing.assert_allclose(native, ref, atol=1e-5)


@pytest.mark.skipif(get_lib() is None, reason="native toolchain unavailable")
def test_native_no_vis_argument(rng):
    cfg = tiny_config()
    joints = [np.stack([rng.uniform(0, cfg.image_size[0], 15),
                        rng.uniform(0, cfg.image_size[1], 15)], 1)]
    ref = generate_input_heatmap(cfg, joints, augment=False)
    native = generate_input_heatmap_native(cfg, joints)
    np.testing.assert_allclose(native, ref, atol=1e-5)


@pytest.mark.skipif(get_lib() is None, reason="native toolchain unavailable")
def test_native_is_faster(rng):
    import time

    cfg = tiny_config()
    joints = [np.stack([rng.uniform(0, cfg.image_size[0], 17),
                        rng.uniform(0, cfg.image_size[1], 17)], 1)
              for _ in range(8)]
    t0 = time.perf_counter()
    for _ in range(20):
        generate_input_heatmap(cfg, joints, augment=False)
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        generate_input_heatmap_native(cfg, joints)
    t_native = time.perf_counter() - t0
    assert t_native < t_np, (t_native, t_np)
