"""Backbone parity: our NHWC PoseResNet with converted weights must
reproduce the reference torch Pose-ResNet's heatmaps (the frozen-backbone
fidelity requirement — drift here directly moves Panoptic MPJPE)."""

import importlib.util
import os
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fvp_tpu.models.resnet import PoseResNet, convert_torch_state

REF_RESNET = "/root/reference/lib/models/resnet.py"


def _ref_cfg(num_joints=15, num_layers=50):
    resnet = types.SimpleNamespace(
        NUM_LAYERS=num_layers,
        DECONV_WITH_BIAS=False,
        NUM_DECONV_LAYERS=3,
        NUM_DECONV_FILTERS=[256, 256, 256],
        NUM_DECONV_KERNELS=[4, 4, 4],
        FINAL_CONV_KERNEL=1,
    )
    dataset = types.SimpleNamespace(NUM_JOINTS=num_joints)
    return types.SimpleNamespace(RESNET=resnet, DATASET=dataset)


def _load_ref_resnet():
    spec = importlib.util.spec_from_file_location("ref_resnet", REF_RESNET)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.exists(REF_RESNET),
                    reason="reference repo not mounted")
def test_resnet50_matches_reference(rng):
    torch.manual_seed(7)
    mod = _load_ref_resnet()
    cfg = _ref_cfg(num_joints=6)
    tmodel = mod.get(cfg)
    tmodel.eval()
    # randomize BN stats so running-average parity is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x = rng.rand(2, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    state = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_torch_state(state, num_layers=50)
    model = PoseResNet(num_joints=6, num_layers=50)
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    got = np.asarray(out).transpose(0, 3, 1, 2)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_resnet_output_resolution(rng):
    import jax

    model = PoseResNet(num_joints=15, num_layers=50)
    x = jnp.zeros((1, 128, 192, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 32, 48, 15)


def test_tpu_fused_stem_and_deconv_parity(rng):
    """The space-to-depth stem and the 2x2-conv+depth-to-space deconv are
    exact rewrites: same param tree, same numerics as the textbook
    nn.Conv(7x7, s2) / nn.ConvTranspose(4x4, s2) path."""
    import jax

    x = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    ref = PoseResNet(num_joints=5, num_layers=18)
    fused = PoseResNet(num_joints=5, num_layers=18, stem="s2d",
                       head="fused")

    variables = ref.init(jax.random.PRNGKey(0), x, train=False)
    y_ref = ref.apply(variables, x, train=False)
    y_fused = fused.apply(variables, x, train=False)  # same tree, reused
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)

    # gradients flow through the kernel rearrangement identically
    def loss(m, v):
        return jnp.sum(m.apply(v, x, train=False) ** 2)

    g_ref = jax.grad(lambda v: loss(ref, v))(variables)["params"]
    g_fused = jax.grad(lambda v: loss(fused, v))(variables)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3),
        g_ref, g_fused)


def test_polyphase_head_parity(rng):
    """The phase-blocked deconv head (constant-resolution matmuls + one
    final depth-to-space) is an exact rewrite of the three ConvTranspose
    stages: same param tree, same numerics, including odd spatial sizes
    where the boundary carry terms matter."""
    import jax

    for h, w in ((64, 96), (96, 160)):   # second: odd head input (3, 5)
        x = jnp.asarray(rng.rand(2, h, w, 3).astype(np.float32))
        ref = PoseResNet(num_joints=5, num_layers=18)
        poly = PoseResNet(num_joints=5, num_layers=18, head="polyphase")

        variables = ref.init(jax.random.PRNGKey(0), x, train=False)
        y_ref = ref.apply(variables, x, train=False)
        y_poly = poly.apply(variables, x, train=False)  # same tree, reused
        np.testing.assert_allclose(np.asarray(y_poly), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)


def test_polyphase_single_stage_vs_convtranspose(rng):
    """One _PolyphaseDeconv stage (P=1 input) against nn.ConvTranspose
    directly, pinning the kernel decomposition and the phase re-indexing
    that absorbs the SAME-padding crop."""
    import flax.linen as nn
    import jax

    from fvp_tpu.models.resnet import _PolyphaseDeconv

    x = jnp.asarray(rng.rand(1, 5, 7, 16).astype(np.float32))
    ct = nn.ConvTranspose(8, (4, 4), strides=(2, 2), padding="SAME",
                          use_bias=False)
    v = ct.init(jax.random.PRNGKey(1), x)
    y_ref = ct.apply(v, x)

    stage = _PolyphaseDeconv(8)
    y = stage.apply({"params": v["params"]}, x[:, :, :, None, None, :])
    assert y.shape == (1, 5, 7, 2, 2, 8)
    got = y.transpose(0, 1, 3, 2, 4, 5).reshape(1, 10, 14, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
