"""MaskedBatchNorm vs a literal torch per-scene loop: the reference JLN
runs its nets once per batch item on only that scene's matched persons
(joint_localization_net.py:148-175), so train-mode BN statistics are per
scene and running stats update sequentially per scene. MaskedBatchNorm
must reproduce both exactly (it is what closes the lockstep A/B's JLN
forward gap — docs/ab_r5/lockstep/forward.json)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fvp_tpu.models.blocks import MaskedBatchNorm


def _torch_reference(x, mask, scale, bias, r_mean, r_var):
    """Sequential per-group torch BN in train mode over masked members."""
    bn = torch.nn.BatchNorm2d(x.shape[-1], momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(r_mean))
        bn.running_var.copy_(torch.from_numpy(r_var))
    bn.train()
    G, M = mask.shape
    out = np.zeros_like(x)
    for g in range(G):
        sel = np.where(mask[g] > 0)[0]
        if len(sel) == 0:
            continue                       # reference skips empty scenes
        xg = torch.from_numpy(
            x[g, sel].transpose(0, 3, 1, 2))        # (P, C, H, W)
        with torch.no_grad():
            y = bn(xg)
        out[g, sel] = y.numpy().transpose(0, 2, 3, 1)
    return out, bn.running_mean.numpy(), bn.running_var.numpy()


def test_masked_bn_matches_torch_per_scene_loop(rng):
    G, M, H, W, C = 4, 6, 8, 8, 5
    x = rng.rand(G, M, H, W, C).astype(np.float32) * 2 - 1
    mask = (rng.rand(G, M) < 0.5).astype(np.float32)
    mask[2] = 0.0                           # one scene with no persons
    mask[0, 0] = 1.0                        # ensure some valid groups
    mask[1, 0] = 1.0
    mask[3, 0] = 1.0
    scale = rng.rand(C).astype(np.float32) + 0.5
    bias = rng.rand(C).astype(np.float32) - 0.5
    r_mean = (rng.rand(C).astype(np.float32) - 0.5)
    r_var = rng.rand(C).astype(np.float32) + 0.5

    want, want_mean, want_var = _torch_reference(
        x, mask, scale, bias, r_mean, r_var)

    m = MaskedBatchNorm()
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(r_mean),
                        "var": jnp.asarray(r_var)},
    }
    y, mut = m.apply(variables, jnp.asarray(x.reshape(G * M, H, W, C)),
                     jnp.asarray(mask), mutable=["batch_stats"])
    got = np.asarray(y).reshape(G, M, H, W, C)

    # valid entries: exact normalization parity; masked entries: zeroed
    np.testing.assert_allclose(got * mask[:, :, None, None, None], got,
                               atol=0)
    valid = mask[:, :, None, None, None]
    np.testing.assert_allclose(got * valid, want * valid, atol=2e-5)

    # sequential running updates (skipping the empty scene), torch
    # unbiased-variance convention
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               want_mean, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               want_var, rtol=1e-5)


def test_masked_bn_all_empty_keeps_running_stats(rng):
    G, M, H, W, C = 2, 3, 4, 4, 3
    x = rng.rand(G, M, H, W, C).astype(np.float32)
    mask = np.zeros((G, M), np.float32)
    r_mean = rng.rand(C).astype(np.float32)
    r_var = rng.rand(C).astype(np.float32) + 0.5
    m = MaskedBatchNorm()
    variables = {
        "params": {"scale": jnp.ones(C), "bias": jnp.zeros(C)},
        "batch_stats": {"mean": jnp.asarray(r_mean),
                        "var": jnp.asarray(r_var)},
    }
    y, mut = m.apply(variables, jnp.asarray(x.reshape(G * M, H, W, C)),
                     jnp.asarray(mask), mutable=["batch_stats"])
    assert float(jnp.max(jnp.abs(y))) == 0.0
    np.testing.assert_array_equal(np.asarray(mut["batch_stats"]["mean"]),
                                  r_mean)
    np.testing.assert_array_equal(np.asarray(mut["batch_stats"]["var"]),
                                  r_var)
