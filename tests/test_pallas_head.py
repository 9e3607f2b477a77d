"""Parity tests for the Pallas backbone deconv head and fused WeightNet
front end (interpret mode on the CPU test platform).

References: the XLA modules they replace — nn.ConvTranspose(4,4,s2,SAME)
+ BN + ReLU stages (fvp_tpu/models/resnet.py head='xla') and WeightNet's
conv+BN+pool+mean (fvp_tpu/models/cnns.py) — themselves parity-pinned
against the reference torch model in tests/test_resnet.py /
tests/test_model.py.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from fvp_tpu.models.cnns import WeightNet
from fvp_tpu.models.resnet import PoseResNet
from fvp_tpu.ops.pallas.deconv_head import (
    bn_affine, deconv_stage_chunked, deconv_stage_rows, pack_k4,
)


def _rand_bn(rng, f):
    scale = jnp.asarray(rng.rand(f).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    mean = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1)
    var = jnp.asarray(rng.rand(f).astype(np.float32) + 0.5)
    return scale, bias, mean, var


@pytest.mark.parametrize("variant", ["rows1", "rows2", "chunked"])
def test_deconv_stage_parity(rng, variant):
    V, H, W, C, F = 2, 8, 14, 64, 32
    x = jnp.asarray(rng.randn(V, H, W, C).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 4, C, F).astype(np.float32) * 0.05)
    scale, bias, mean, var = _rand_bn(rng, F)

    ct = nn.ConvTranspose(F, (4, 4), strides=(2, 2), padding="SAME",
                          use_bias=False)
    y = ct.apply({"params": {"kernel": k}}, x)
    a = scale / jnp.sqrt(var + 1e-5)
    ref = jnp.maximum(y * a + (bias - mean * a), 0.0)

    aff = bn_affine(scale, bias, mean, var)
    if variant == "chunked":
        got = deconv_stage_chunked(x, pack_k4(k), aff, NC=4, interpret=True)
    else:
        nb = 1 if variant == "rows1" else 2
        got = deconv_stage_rows(x, pack_k4(k), aff, NB=nb, interpret=True)
    assert got.shape == ref.shape
    # kernel computes in bf16 (the serving dtype); f32 reference
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), atol=5e-2, rtol=5e-2)


def test_pose_resnet_pallas_head_matches_xla(rng):
    x = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)
    bb_x = PoseResNet(num_joints=15, num_layers=18, dtype=jnp.bfloat16,
                      head="xla")
    bb_p = PoseResNet(num_joints=15, num_layers=18, dtype=jnp.bfloat16,
                      head="pallas")
    vars_x = bb_x.init(key, x, train=False)
    vars_p = bb_p.init(key, x, train=False)
    # identical variable trees -> checkpoints interchangeable
    assert (jtu.tree_map(lambda a: a.shape, vars_x)
            == jtu.tree_map(lambda a: a.shape, vars_p))
    assert jtu.tree_all(
        jtu.tree_map(lambda a, b: bool(jnp.all(a == b)), vars_x, vars_p))

    yx = bb_x.apply(vars_x, x, train=False)
    yp = bb_p.apply(vars_x, x, train=False)
    scale = float(jnp.max(jnp.abs(yx)))
    assert float(jnp.max(jnp.abs(yx - yp))) < 5e-3 * max(scale, 1.0)


def test_pose_resnet_pallas_head_rejects_train(rng):
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    bb = PoseResNet(num_joints=15, num_layers=18, head="pallas")
    with pytest.raises(ValueError, match="inference-only"):
        bb.init(jax.random.PRNGKey(0), x, train=True)


def test_pallas_stem_matches_xla_stem(rng):
    """stem='host_s2d' (Pallas conv+bn+relu+pool over a host space-to-depth
    input) against the canonical stem path, same conv1/bn1 parameters."""
    img = rng.rand(2, 64, 96, 3).astype(np.float32)
    key = jax.random.PRNGKey(7)
    bb_x = PoseResNet(num_joints=15, num_layers=18, dtype=jnp.bfloat16,
                      stem="xla")
    bb_s = PoseResNet(num_joints=15, num_layers=18, dtype=jnp.bfloat16,
                      stem="host_s2d")

    from fvp_tpu.ops.pallas.stem import s2d_host
    x = jnp.asarray(img)
    xs = jnp.asarray(s2d_host(img))
    vars_x = bb_x.init(key, x, train=False)
    vars_s = bb_s.init(key, xs, train=False)
    assert (jtu.tree_map(lambda a: a.shape, vars_x)
            == jtu.tree_map(lambda a: a.shape, vars_s))

    yx = bb_x.apply(vars_x, x, train=False)
    ys = bb_s.apply(vars_x, xs, train=False)
    scale = float(jnp.max(jnp.abs(yx)))
    assert float(jnp.max(jnp.abs(yx - ys))) < 5e-3 * max(scale, 1.0)


def test_weightnet_pallas_matches_xla(rng):
    x = jnp.asarray(rng.rand(6, 64, 64, 15).astype(np.float32))
    key = jax.random.PRNGKey(3)
    wn_x = WeightNet(dtype=jnp.bfloat16, use_pallas=False)
    wn_p = WeightNet(dtype=jnp.bfloat16, use_pallas=True)
    vx = wn_x.init(key, x, train=False)
    vp = wn_p.init(key, x, train=False)
    assert (jtu.tree_map(lambda a: a.shape, vx)
            == jtu.tree_map(lambda a: a.shape, vp))
    assert jtu.tree_all(
        jtu.tree_map(lambda a, b: bool(jnp.all(a == b)), vx, vp))

    # perturb BN stats so the fold is non-trivial
    vx = jtu.tree_map(
        lambda a: a + 0.01 * rng.rand(*a.shape).astype(np.float32)
        if a.ndim == 1 else a, vx)
    yx = wn_x.apply(vx, x, train=False)
    yp = wn_p.apply(vx, x, train=False)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx), atol=2e-3)


def test_pose_resnet_packed_head_matches_in_call_packing(rng):
    """Weight-packing hoist for head='pallas' (engine/packing.py
    pack_backbone_variables): the 'packed' collection path is bitwise
    equal to in-call pack_k4 packing."""
    from fvp_tpu.engine.packing import pack_backbone_variables

    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    bb = PoseResNet(num_joints=15, num_layers=18, dtype=jnp.bfloat16,
                    head="pallas")
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    y_plain = bb.apply(variables, x, train=False)

    packed_vars = pack_backbone_variables(variables)
    assert "head_fused" in packed_vars["packed"]
    y_packed = bb.apply(packed_vars, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_packed),
                                  np.asarray(y_plain))


def test_pallas_stem_16lane_format_matches(rng):
    """channels=16 host-s2d format (4 zero channels appended so im2col tap
    pieces are 16-lane): same output as the 12-channel format and the XLA
    stem (NOTES_ROUND3 lever 3)."""
    from fvp_tpu.ops.pallas.stem import s2d_host

    img = rng.rand(1, 64, 96, 3).astype(np.float32)
    key = jax.random.PRNGKey(7)
    bb_x = PoseResNet(num_joints=15, num_layers=18, dtype=jnp.bfloat16,
                      stem="xla")
    bb_s = PoseResNet(num_joints=15, num_layers=18, dtype=jnp.bfloat16,
                      stem="host_s2d")
    x = jnp.asarray(img)
    vars_x = bb_x.init(key, x, train=False)

    y12 = bb_s.apply(vars_x, jnp.asarray(s2d_host(img)), train=False)
    y16 = bb_s.apply(vars_x, jnp.asarray(s2d_host(img, channels=16)),
                     train=False)
    np.testing.assert_array_equal(np.asarray(y16), np.asarray(y12))
