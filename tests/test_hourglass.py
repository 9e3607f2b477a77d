"""Parity tests for the fused Pallas hourglass task-net kernels
(interpret mode on the CPU test platform) against the flax modules they
replace at inference (fvp_tpu/models/cnns.py), which are themselves
reference-parity-pinned in tests/test_model.py."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from fvp_tpu.models.cnns import P2PNet
from fvp_tpu.ops.pallas.hourglass import hourglass_supported, pallas_p2pnet


def _perturbed_vars(module, x, seed):
    v = module.init(jax.random.PRNGKey(seed), x, train=False)
    rng = np.random.RandomState(seed + 1)
    # shift every 1-D tensor (BN stats/affines, biases) so folding and
    # bias paths are non-trivial
    return jtu.tree_map(
        lambda a: a + 0.05 * rng.rand(*a.shape).astype(np.float32)
        if a.ndim == 1 else a, v)


def test_p2p_hourglass_matches_module(rng):
    x = jnp.asarray(rng.rand(4, 64, 64, 15).astype(np.float32))
    m = P2PNet(num_joints=15, dtype=jnp.bfloat16)
    v = _perturbed_vars(m, x, 1)
    ref = m.apply(v, x, train=False)
    got = pallas_p2pnet(v, x, 15, interpret=True)
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-2 * max(scale, 1e-3)


def test_hourglass_supported_gate():
    assert hourglass_supported((30, 64, 64, 15))
    assert not hourglass_supported((30, 16, 16, 15))   # tiny test configs
    assert not hourglass_supported((1, 80, 80, 15))    # BEV 80 -> 20 at L2
