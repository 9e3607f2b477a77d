"""Patch-matmul bilinear sampler parity vs the exact gather implementation
(which is itself parity-tested against torch grid_sample)."""

import jax.numpy as jnp
import numpy as np

from fvp_tpu.geometry.grids import build_rig_constants
from fvp_tpu.ops.fast_sampling import pad_heatmaps, tiled_bilinear
from fvp_tpu.ops.sampling import (
    bilinear_sample, project_whole, sample_person_cubes,
)
from tests.helpers import random_rig, tiny_config


def test_tiled_bilinear_matches_gather(rng):
    J, H, W = 5, 64, 96
    hm = rng.rand(J, H, W).astype(np.float32)
    # coherent tiles: cluster centers + small jitter (mimics projected tiles)
    T, S = 24, 64
    cx = rng.uniform(5, W - 5, (T, 1))
    cy = rng.uniform(5, H - 5, (T, 1))
    sx = (cx + rng.uniform(-6, 6, (T, S))).astype(np.float32)
    sy = (cy + rng.uniform(-6, 6, (T, S))).astype(np.float32)

    fast = np.asarray(tiled_bilinear(
        jnp.asarray(pad_heatmaps(jnp.asarray(hm))),
        jnp.asarray(sx), jnp.asarray(sy)))
    exact = np.asarray(bilinear_sample(
        jnp.asarray(hm), jnp.asarray(sx.ravel()), jnp.asarray(sy.ravel())))
    exact = exact.reshape(J, T, S).transpose(1, 0, 2)
    np.testing.assert_allclose(fast, exact, atol=2e-5)


def test_tiled_bilinear_out_of_bounds_zero(rng):
    J, H, W = 3, 64, 96
    hm = rng.rand(J, H, W).astype(np.float32)
    # a tile pinned far outside (reference clamp pins these; value must be 0)
    sx = np.full((2, 32), -11.95, np.float32)
    sy = np.full((2, 32), 40.0, np.float32)
    out = np.asarray(tiled_bilinear(
        jnp.asarray(pad_heatmaps(jnp.asarray(hm))),
        jnp.asarray(sx), jnp.asarray(sy)))
    np.testing.assert_allclose(out, 0.0, atol=1e-7)
    # boundary-straddling samples still interpolate correctly
    sx2 = np.linspace(-2.0, 3.0, 32, dtype=np.float32)[None].repeat(2, 0)
    sy2 = np.full((2, 32), 10.5, np.float32)
    out2 = np.asarray(tiled_bilinear(
        jnp.asarray(pad_heatmaps(jnp.asarray(hm))),
        jnp.asarray(sx2), jnp.asarray(sy2)))
    exact = np.asarray(bilinear_sample(
        jnp.asarray(hm), jnp.asarray(sx2.ravel()), jnp.asarray(sy2.ravel())))
    exact = exact.reshape(J, 2, 32).transpose(1, 0, 2)
    np.testing.assert_allclose(out2, exact, atol=2e-5)
