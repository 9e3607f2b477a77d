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


@pytest.mark.skipif(get_lib() is None, reason="native toolchain unavailable")
def test_native_augment_deterministic_and_plausible(rng):
    """Augmented rendering: deterministic per seed, seed-sensitive, and
    only ever attenuates/occludes the clean gaussians (scale <= ~1,
    occlusion zeroes) — the reference's augmentation semantics
    (JointsDataset.py:414-431) with a native RNG stream."""
    cfg = tiny_config(sigma=3.0)
    joints = [np.stack([rng.uniform(0, cfg.image_size[0], 15),
                        rng.uniform(0, cfg.image_size[1], 15)], 1)
              for _ in range(3)]

    a1 = generate_input_heatmap_native(cfg, joints, augment=True, seed=42)
    a2 = generate_input_heatmap_native(cfg, joints, augment=True, seed=42)
    np.testing.assert_array_equal(a1, a2)

    b = generate_input_heatmap_native(cfg, joints, augment=True, seed=43)
    assert not np.array_equal(a1, b)

    clean = generate_input_heatmap_native(cfg, joints, augment=False)
    # augmentation only attenuates (up to the 0.9 + 3sigma*0.03 jitter cap)
    assert np.all(a1 <= clean + 0.01 + 1e-6)
    assert a1.max() <= 1.0
    # something actually changed vs the clean render
    assert np.any(a1 < clean - 1e-3)
