"""Torch-default weight re-initialization.

The reference never calls its models' `_initialize_weights`, so every
conv/dense layer trains from PyTorch DEFAULT init: kernels
kaiming_uniform(a=sqrt(5)) — for a conv kernel that is U(+-sqrt(1/fan_in))
with fan_in = kh*kw*cin — and biases U(+-1/sqrt(fan_in)) (torch
nn.Conv2d/Linear reset_parameters). Flax defaults differ (lecun_normal
kernels, ZERO biases). For the cross-framework convergence A/B
(CORRECTNESS_r04) this is the one remaining framework asymmetry after
data, loss, optimizer and augmentation parity — `torch_like_reinit`
walks an existing flax param tree and redraws every kernel/bias from the
torch-default distributions, keyed per leaf.

ConvTranspose note: torch's fan_in for ConvTranspose2d weights
(in, out, kh, kw) is out*kh*kw (dim-1 based); flax stores
(kh, kw, cin, cout), so transposed layers (path contains
'ConvTranspose') use cout*kh*kw.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fan_in(path: tuple, shape: tuple) -> int:
    name = "/".join(str(getattr(p, "key", p)) for p in path)
    if len(shape) == 1:
        raise ValueError("bias handled via sibling kernel")
    if len(shape) == 2:                      # Dense (in, out)
        return shape[0]
    receptive = 1
    for k in shape[:-2]:
        receptive *= k
    if "ConvTranspose" in name:
        return shape[-1] * receptive         # torch dim-1 of (in,out,k,k)
    return shape[-2] * receptive             # (kh, kw, cin, cout)


def torch_like_reinit(params, key: jax.Array):
    """Redraw every {kernel, bias} leaf pair from torch-default
    distributions; all other leaves (BN scale/bias, batch_stats held
    elsewhere) are returned unchanged."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(key, len(flat))

    fan_by_parent = {}
    for path, leaf in flat:
        name = str(getattr(path[-1], "key", path[-1]))
        if name == "kernel" and leaf.ndim >= 2:
            fan_by_parent[path[:-1]] = _fan_in(path, leaf.shape)

    new_leaves = []
    for (path, leaf), k in zip(flat, keys):
        name = str(getattr(path[-1], "key", path[-1]))
        if name == "kernel" and leaf.ndim >= 2:
            bound = (1.0 / _fan_in(path, leaf.shape)) ** 0.5
            new = jax.random.uniform(k, leaf.shape, jnp.float32,
                                     -bound, bound)
        elif name == "bias" and path[:-1] in fan_by_parent:
            bound = (1.0 / fan_by_parent[path[:-1]]) ** 0.5
            new = jax.random.uniform(k, leaf.shape, jnp.float32,
                                     -bound, bound)
        else:
            new = leaf
        new_leaves.append(new.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
