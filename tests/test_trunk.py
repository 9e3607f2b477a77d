"""Fused bottleneck-stage kernel (ops/pallas/trunk.py) parity vs the
flax Bottleneck chain (models/resnet.py) — interpret mode on CPU."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fvp_tpu.models.resnet import Bottleneck
from fvp_tpu.ops.pallas.trunk import (
    pack_bottleneck_stage, pallas_bottleneck_stage,
)


class _Stage(nn.Module):
    cmid: int
    blocks: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        for bi in range(self.blocks):
            down = bi == 0 and cin != self.cmid * 4
            x = Bottleneck(self.cmid, 1, down, dtype=jnp.bfloat16,
                           name=f"layer1_{bi}")(x, train)
        return x


@pytest.mark.parametrize("blocks,cmid,shape", [
    (3, 16, (2, 32, 48)),      # layer1-like (downsample on block 0)
    (2, 8, (1, 16, 24)),
])
def test_bottleneck_stage_matches_flax(rng, blocks, cmid, shape):
    V, H, W = shape
    cin = cmid * 2
    x = jnp.asarray(rng.rand(V, H, W, cin).astype(np.float32) - 0.3
                    ).astype(jnp.bfloat16)
    m = _Stage(cmid=cmid, blocks=blocks)
    variables = m.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats so the folded affine actually matters
    stats = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(
            np.random.RandomState(3).rand(*a.shape) * 0.1,
            a.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    ref = m.apply(variables, x, train=False)

    names = tuple(f"layer1_{i}" for i in range(blocks))
    packed = pack_bottleneck_stage(variables["params"],
                                   variables["batch_stats"], names)
    cfg = tuple((cmid, i == 0) for i in range(blocks))
    got = pallas_bottleneck_stage(x, packed, cfg, R=8, interpret=True)

    assert got.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 2e-2 * max(scale, 1.0), (err, scale)
