"""Task-net weight-transplant parity: fvp modules with converted torch
weights must reproduce the reference nets' outputs (eval AND train-mode
batch-stat forwards) — the foundation of the lockstep A/B
(tools/ab_lockstep.py)."""

import importlib.util
import os
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fvp_tpu.models.cnns import C2CNet, CenterNet, P2PNet, WeightNet
from fvp_tpu.models.convert_tasknets import (
    convert_c2c_net, convert_center_net, convert_p2p_net,
    convert_weight_net,
)

REF = "/root/reference/lib/models"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference repo not mounted")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(REF, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize_bn(tmodel, gen):
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.uniform_(-0.5, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)
                m.weight.uniform_(0.5, 1.5, generator=gen)
                m.bias.uniform_(-0.3, 0.3, generator=gen)


def _prefixed(tmodel, prefix):
    # snapshot (train-mode forwards mutate BN running stats in place)
    return {f"{prefix}.{k}": v.detach().clone()
            for k, v in tmodel.state_dict().items()}


def _apply(module, params, stats, x, train=False):
    out = module.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=train,
                       mutable=["batch_stats"] if train else False)
    return out if train else (out, None)


@needs_ref
@pytest.mark.parametrize("train", [False, True])
def test_center_net_parity(rng, train):
    torch.manual_seed(3)
    gen = torch.Generator().manual_seed(4)
    mod = _load("cnns_2d")
    J = 6
    tnet = mod.CenterNet(J, 1)
    _randomize_bn(tnet, gen)
    tnet.train(train)

    params, stats = convert_center_net(_prefixed(tnet, "p"), "p")
    x = rng.rand(2, J, 32, 32, 8).astype(np.float32)   # (B, J, X, Y, Z)
    with torch.no_grad():
        thm, tsize = tnet(torch.from_numpy(x))

    vol = x.transpose(0, 2, 3, 4, 1)                   # (B, X, Y, Z, J)
    (hm, size), mutated = _apply(CenterNet(), params, stats, vol, train)

    np.testing.assert_allclose(np.asarray(hm)[..., 0], thm.numpy()[:, 0],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(size).transpose(0, 3, 1, 2),
                               tsize.numpy(), atol=2e-4)
    if train:
        # running-stat updates must track torch's (torch uses the UNBIASED
        # batch variance for the running update; flax uses the biased one —
        # at these reduction sizes the difference is < 1e-3 relative)
        got = mutated["batch_stats"]["BasicBlock_0"]["BatchNorm_0"]
        want = tnet.front_layers[0].block[1]
        np.testing.assert_allclose(np.asarray(got["mean"]),
                                   want.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["var"]),
                                   want.running_var.numpy(), rtol=2e-3)


@needs_ref
@pytest.mark.parametrize("train", [False, True])
def test_c2c_net_parity(rng, train):
    torch.manual_seed(5)
    gen = torch.Generator().manual_seed(6)
    mod = _load("cnns_1d")
    J = 6
    tnet = mod.C2CNet(J, 1)
    _randomize_bn(tnet, gen)
    tnet.train(train)

    params, stats = convert_c2c_net(_prefixed(tnet, "p"), "p")
    x = rng.rand(4, J, 16).astype(np.float32)          # (N, J, Z)
    with torch.no_grad():
        thm = tnet(torch.from_numpy(x))

    out, _ = _apply(C2CNet(), params, stats, x.transpose(0, 2, 1), train)
    np.testing.assert_allclose(np.asarray(out), thm.numpy()[:, 0],
                               atol=2e-4)


@needs_ref
@pytest.mark.parametrize("train", [False, True])
def test_p2p_net_parity(rng, train):
    torch.manual_seed(7)
    gen = torch.Generator().manual_seed(8)
    mod = _load("cnns_2d")
    J = 6
    tnet = mod.P2PNet(J, J)
    _randomize_bn(tnet, gen)
    tnet.train(train)

    params, stats = convert_p2p_net(_prefixed(tnet, "p"), "p")
    x = rng.rand(3, J, 32, 32).astype(np.float32)      # (N, J, A, B)
    with torch.no_grad():
        t = tnet(torch.from_numpy(x))

    out, _ = _apply(P2PNet(num_joints=J), params, stats,
                    x.transpose(0, 2, 3, 1), train)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               t.numpy(), atol=2e-4)


@needs_ref
@pytest.mark.parametrize("train", [False, True])
def test_weight_net_parity(rng, train):
    torch.manual_seed(9)
    gen = torch.Generator().manual_seed(10)
    mod = _load("weight_net")
    J, A = 6, 32
    cfg = types.SimpleNamespace(
        INDIVIDUAL_SPEC=types.SimpleNamespace(VOXELS_PER_AXIS=[A, A, A]),
        DATASET=types.SimpleNamespace(NUM_JOINTS=J),
        NETWORK=types.SimpleNamespace(NUM_CHANNEL_JOINT_FEAT=32,
                                      NUM_CHANNEL_JOINT_HIDDEN=64))
    tnet = mod.WeightNet(cfg)
    # WeightNet trains from torch DEFAULT init (its _initialize_weights is
    # never called) — keep the defaults, randomize only BN state
    _randomize_bn(tnet, gen)
    tnet.train(train)

    params, stats = convert_weight_net(_prefixed(tnet, "p"), "p")
    x = rng.rand(2, 3, J, A, A).astype(np.float32)     # (B, K, J, A, B)
    with torch.no_grad():
        t = tnet(torch.from_numpy(x))                  # (B*K, J, 1)

    xin = x.reshape(6, J, A, A).transpose(0, 2, 3, 1)  # (N, A, B, J)
    out, _ = _apply(WeightNet(use_pallas=False), params, stats, xin, train)
    np.testing.assert_allclose(np.asarray(out), t.numpy(), atol=2e-4)
