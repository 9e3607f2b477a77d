"""On-device gaussian heatmap rendering: the 'gt'/'pred' heatmap sources
splatted inside the jitted step from projected 2D joints.

Why: input heatmaps at flagship shapes are 59 MB/batch in f32 — hauling
them host->device made the data link the training bottleneck (and the
only part of the pipeline that scales with image resolution). The actual
information content is the projected joint coordinates plus a handful of
augmentation draws: ~100 KB/batch. So the host keeps what it is good at
(camera projection, RNG draws — fvp_tpu/data/base.py packs them into
`render_params`), and the splat itself — dense, regular, trivially
parallel — runs on the VPU.

Math matches fvp_tpu/data/heatmaps.py::generate_input_heatmap (behavioral
reference: /root/reference/lib/dataset/JointsDataset.py:368-446) exactly,
including the integer-truncation window arithmetic, scale-adaptive sigma,
per-joint peak scaling, and the occlusion rectangle applied in
window-local indices (the reference's quirk). Parity-tested against the
numpy renderer in tests/test_device_render.py.

Augmentation randomness is drawn on the HOST (fvp_tpu/data/base.py) and
shipped as plain arrays, so the device op stays pure and a seeded run is
bit-reproducible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fvp_tpu.config import FVPConfig


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_heatmaps_device(cfg: FVPConfig, mu: jax.Array,
                           vis: jax.Array, sigma: jax.Array,
                           scale: jax.Array, occ: jax.Array) -> jax.Array:
    """mu: (..., P, J, 2) int32 HEATMAP-grid joint centers, truncated on
    the host in float64 exactly like the reference's
    int(coord / feat_stride) (shipping the int avoids f32 boundary flips);
    vis: (..., P, J) float (0 = skip joint); sigma: (..., P) per-person
    gaussian sigma in heatmap pixels (0 = skip person);
    scale: (..., P, J) peak multipliers (1.0 = clean);
    occ: (..., P, J, 4) int32 window-local occlusion [y0, y1, x0, x1)
    (y1 <= y0 = none). Returns (..., J, hm_h, hm_w) float32 heatmaps.

    Leading batch dims (e.g. (B, V)) are vmapped."""
    lead = mu.shape[:-3]
    fn = _render_single
    for _ in lead:
        fn = jax.vmap(fn, in_axes=(None, 0, 0, 0, 0, 0))
    return fn(cfg, mu, vis, sigma, scale, occ)


def _render_single(cfg: FVPConfig, mu, vis, sigma, scale, occ):
    """(P, J, 2) int mu -> (J, hm_h, hm_w)."""
    P, J = mu.shape[:2]
    hm_w, hm_h = cfg.heatmap_size

    # reference arithmetic, vectorized: int() truncation via int32 cast
    mu_x = mu[..., 0]                                      # (P, J)
    mu_y = mu[..., 1]
    tmp = sigma[:, None] * 3.0                             # (P, 1)
    ul_x = (mu_x.astype(jnp.float32) - tmp).astype(jnp.int32)
    ul_y = (mu_y.astype(jnp.float32) - tmp).astype(jnp.int32)
    br_x = (mu_x.astype(jnp.float32) + tmp + 1.0).astype(jnp.int32)
    br_y = (mu_y.astype(jnp.float32) + tmp + 1.0).astype(jnp.int32)
    c0 = jnp.floor((2.0 * tmp + 1.0) / 2.0)                # (P, 1)

    alive = ((vis > 0) & (sigma[:, None] > 0)
             & (ul_x < hm_w) & (ul_y < hm_h)
             & (br_x >= 0) & (br_y >= 0))                  # (P, J)
    inv2s2 = jnp.where(sigma > 0, 1.0 / (2.0 * sigma * sigma + 1e-30),
                       0.0)                                # (P,)

    xs = jnp.arange(hm_w, dtype=jnp.int32)
    ys = jnp.arange(hm_h, dtype=jnp.int32)

    def one_person(p, acc):
        gx = xs[None, None, :] - ul_x[p][:, None, None]    # (J, 1, W) loc x
        gy = ys[None, :, None] - ul_y[p][:, None, None]    # (J, H, 1) loc y
        dx = gx.astype(jnp.float32) - c0[p]
        dy = gy.astype(jnp.float32) - c0[p]
        g = jnp.exp(-(dx * dx + dy * dy) * inv2s2[p])      # (J, H, W)
        g = g * scale[p][:, None, None]
        in_win = ((gx >= 0) & (xs[None, None, :] < br_x[p][:, None, None])
                  & (gy >= 0)
                  & (ys[None, :, None] < br_y[p][:, None, None]))
        occluded = ((gy >= occ[p, :, 0][:, None, None])
                    & (gy < occ[p, :, 1][:, None, None])
                    & (gx >= occ[p, :, 2][:, None, None])
                    & (gx < occ[p, :, 3][:, None, None]))
        keep = in_win & ~occluded & alive[p][:, None, None]
        return jnp.maximum(acc, jnp.where(keep, g, 0.0))

    acc = jnp.zeros((J, hm_h, hm_w), jnp.float32)
    acc = jax.lax.fori_loop(0, P, one_person, acc)
    return jnp.clip(acc, 0.0, 1.0)
