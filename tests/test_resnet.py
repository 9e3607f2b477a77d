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
