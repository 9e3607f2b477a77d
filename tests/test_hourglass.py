"""Parity tests for the fused Pallas hourglass task-net kernels
(interpret mode on the CPU test platform) against the flax modules they
replace at inference (fvp_tpu/models/cnns.py), which are themselves
reference-parity-pinned in tests/test_model.py."""

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from fvp_tpu.models.cnns import C2CNet, CenterNet, P2PNet
from fvp_tpu.ops.pallas.hourglass import (
    hourglass_supported, pallas_c2cnet, pallas_centernet, pallas_p2pnet,
)


def _perturbed_vars(module, x, seed):
    v = module.init(jax.random.PRNGKey(seed), x, train=False)
    rng = np.random.RandomState(seed + 1)

    # boost conv kernels (default init is std 0.001 — outputs would be
    # bias-dominated and the comparison vacuous) and shift every 1-D
    # tensor (BN stats/affines, biases) so folding and bias paths are
    # non-trivial
    def tweak(path, a):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        if a.ndim >= 2 and name == "kernel":
            return a * 30.0
        if a.ndim == 1:
            return a + 0.05 * rng.rand(*a.shape).astype(np.float32)
        return a

    return jtu.tree_map_with_path(tweak, v)


def test_p2p_hourglass_matches_module(rng):
    x = jnp.asarray(rng.rand(4, 64, 64, 15).astype(np.float32))
    m = P2PNet(num_joints=15, dtype=jnp.bfloat16)
    v = _perturbed_vars(m, x, 1)
    ref = m.apply(v, x, train=False)
    got = pallas_p2pnet(v, x, 15, interpret=True)
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-2 * max(scale, 1e-3)


def test_centernet_hourglass_matches_module(rng):
    """BEV 80x80: the deepest level is 20 wide -> exercises the pad+mask
    path."""
    vol = jnp.asarray(rng.rand(2, 80, 80, 20, 15).astype(np.float32))
    m = CenterNet(dtype=jnp.bfloat16)
    v = _perturbed_vars(m, vol, 2)
    hm_ref, size_ref = m.apply(v, vol, train=False)
    bev = jnp.max(vol, axis=3)
    hm, size = pallas_centernet(v, bev, interpret=True)
    for got, ref in ((hm, hm_ref), (size, size_ref)):
        assert got.shape == ref.shape
        scale = float(jnp.max(jnp.abs(ref)))
        assert float(jnp.max(jnp.abs(got - ref))) < 2e-2 * max(scale, 1e-3)


def test_c2cnet_matches_module(rng):
    cols = jnp.asarray(rng.rand(10, 20, 15).astype(np.float32))
    m = C2CNet(dtype=jnp.bfloat16)
    v = _perturbed_vars(m, cols, 3)
    ref = m.apply(v, cols, train=False)
    got = pallas_c2cnet(v, cols, interpret=True)
    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-2 * max(scale, 1e-3)


def test_hourglass_supported_gate():
    assert hourglass_supported((30, 64, 64, 15))
    assert not hourglass_supported((30, 16, 16, 15))   # tiny test configs
    assert hourglass_supported((1, 80, 80, 15))        # BEV: L2 pad+mask
