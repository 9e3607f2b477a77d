"""BEV-heatmap peak extraction: 3x3 max-pool NMS + top-K.

Behavioral reference: /root/reference/lib/core/proposal.py:13-76. Local maxima
survive a same-padded 3x3 max window (ties with the local max all survive,
matching the reference's `inputs == max` comparison); everything else is
zeroed, then a flat top-K picks the proposals.

TPU mapping: `jax.lax.reduce_window` lowers the max pool onto the VPU;
`jax.lax.top_k` handles selection. Under voxel-block sharding the max window
needs a 1-cell halo at block seams — fvp_tpu/parallel/spatial.py implements
that (ppermute halo exchange + local NMS + gathered top-K merge).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def maxpool_nms_2d(hm: jax.Array, kernel: int = 3) -> jax.Array:
    """Keep only local maxima of a (X, Y) map; zero elsewhere."""
    pad = (kernel - 1) // 2
    local_max = jax.lax.reduce_window(
        hm, -jnp.inf, jax.lax.max,
        window_dimensions=(kernel, kernel),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
    )
    return jnp.where(hm == local_max, hm, jnp.zeros_like(hm))


def nms_topk_2d(hm: jax.Array, max_num: int, kernel: int = 3):
    """(X, Y) heatmap -> (topk_vals (K,), topk_xy (K, 2) int32, flat (K,)).

    Flat index convention matches the reference: flat = x * Y + y, so the
    first coordinate is the x (row) voxel index (proposal.py:27-31).
    """
    X, Y = hm.shape
    keep = maxpool_nms_2d(hm, kernel)
    vals, flat = jax.lax.top_k(keep.reshape(-1), max_num)
    xy = jnp.stack([flat // Y, flat % Y], axis=1).astype(jnp.int32)
    return vals, xy, flat
