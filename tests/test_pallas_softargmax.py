"""Interpret-mode parity of the fused Pallas soft-argmax against the XLA
reference implementation (ops/softargmax.py), which is itself oracle-tested
against the reference's SoftArgmaxLayer semantics
(/root/reference/lib/models/joint_localization_net.py:15-56)."""

import jax.numpy as jnp
import numpy as np

from fvp_tpu.geometry.grids import center_grids
from fvp_tpu.ops.pallas.softargmax import pallas_soft_argmax
from fvp_tpu.ops.softargmax import soft_argmax
from tests.helpers import tiny_config


def test_pallas_softargmax_matches_xla(rng):
    cfg = tiny_config(ind_voxels_per_axis=(16, 16, 16))
    grid = jnp.asarray(center_grids(cfg), jnp.float32)       # (3, 256, 2)
    S, N, _ = grid.shape
    P, J = 4, cfg.num_joints
    # realistic P2P-net output scale: small values around zero plus peaks
    planes = rng.randn(S, P, N, J).astype(np.float32) * 0.05
    peaks = rng.randint(0, N, size=(S, P, J))
    for s in range(S):
        for p in range(P):
            planes[s, p, peaks[s, p], np.arange(J)] += 1.0
    planes = jnp.asarray(planes)

    ref_coords, ref_confs = soft_argmax(planes, grid, beta=100.0)
    got_coords, got_confs = pallas_soft_argmax(planes, grid, beta=100.0,
                                               interpret=True)
    np.testing.assert_allclose(np.asarray(got_coords),
                               np.asarray(ref_coords), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_confs),
                               np.asarray(ref_confs), rtol=1e-5, atol=1e-6)


def test_pallas_softargmax_decodes_peak(rng):
    """A sharp peak at a known cell must decode to that cell's mm coords."""
    cfg = tiny_config(ind_voxels_per_axis=(16, 16, 16))
    grid = jnp.asarray(center_grids(cfg), jnp.float32)
    S, N, _ = grid.shape
    J = cfg.num_joints
    planes = np.zeros((S, 1, N, J), np.float32)
    cell = 77
    planes[:, :, cell, :] = 1.0
    coords, confs = pallas_soft_argmax(jnp.asarray(planes), grid,
                                       beta=100.0, interpret=True)
    for s in range(S):
        np.testing.assert_allclose(np.asarray(coords[s, 0, 0]),
                                   np.asarray(grid[s, cell]), atol=1e-2)
    assert float(confs[0]) > 0.9
