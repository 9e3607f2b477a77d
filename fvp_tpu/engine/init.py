"""Weight re-initialization utilities for cross-framework parity work.

`torch_like_reinit` redraws kernels/biases from PyTorch DEFAULT init:
kernels kaiming_uniform(a=sqrt(5)) — for a conv kernel that is
U(+-sqrt(1/fan_in)) with fan_in = kh*kw*cin — and biases
U(+-1/sqrt(fan_in)) (torch nn.Conv2d/Linear reset_parameters). This is
what the reference's WEIGHTNET trains from (its `_initialize_weights`
is defined but never invoked); the reference's other three small nets
DO call theirs (N(0, 0.001) + zero bias), which fvp's flax modules
already match by default — see `reference_reinit` below for the full
scheme used by the CORRECTNESS_r04 A/B control arm.

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


def reference_reinit(params, key: jax.Array):
    """Reference-exact initialization, independent draw.

    The reference's scheme: CenterNet / C2CNet / P2PNet call
    `self._initialize_weights()` in their constructors — every
    Conv/ConvTranspose weight ~ N(0, 0.001), every bias = 0
    (lib/models/cnns_2d.py:215,224-232 & :278,297-305;
    cnns_1d.py:214,231-241) — which fvp's flax modules ALREADY match by
    default (models/blocks.py INIT). WeightNet DEFINES the method but
    never calls it (weight_net.py:82-90), so it trains from torch
    DEFAULTS (kaiming_uniform kernels + uniform biases) where fvp's
    default is flax lecun_normal + zero biases — the ONE init-family
    asymmetry between the frameworks.

    This function redraws the three small nets from the same N(0, 0.001)
    scheme (a fresh seed draw) and gives WeightNet the torch-default
    distributions via `torch_like_reinit`; BN affines are untouched. In
    the cross-framework A/B it serves as the init-family +
    trajectory-seed control arm."""
    k_small, k_wn = jax.random.split(key)
    out = dict(params)
    for mi, name in enumerate(("center_net", "c2c_net", "p2p_net")):
        sub = params[name]
        flat = jax.tree_util.tree_flatten_with_path(sub)[0]
        tdef = jax.tree_util.tree_structure(sub)
        keys = jax.random.split(jax.random.fold_in(k_small, mi),
                                max(len(flat), 1))
        leaves = []
        for (path, leaf), k in zip(flat, keys):
            pname = str(getattr(path[-1], "key", path[-1]))
            if pname == "kernel" and leaf.ndim >= 2:
                leaves.append((jax.random.normal(k, leaf.shape, jnp.float32)
                               * 1e-3).astype(leaf.dtype))
            elif pname == "bias":
                leaves.append(jnp.zeros_like(leaf))
            else:
                leaves.append(leaf)
        out[name] = jax.tree_util.tree_unflatten(tdef, leaves)
    out["weight_net"] = torch_like_reinit(params["weight_net"], k_wn)
    return out
