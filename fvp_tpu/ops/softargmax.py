"""Temperature soft-argmax over tri-plane joint heatmaps.

Behavioral reference: /root/reference/lib/models/joint_localization_net.py:15-56.
probs = softmax(beta * plane) over the flattened plane; the decoded coordinate
is the probability-weighted expectation against the plane's mm-coordinate
grid; the per-person confidence is the mean (over planes and joints) of the
per-map max probability.

The expectation `probs @ grid` is a (J, N) x (N, 2) matmul per plane —
MXU-friendly. A fused single-pass Pallas variant
(fvp_tpu/ops/pallas/softargmax.py) avoids the HBM round trips of the probs
tensor and is used on the inference path; this XLA version remains the
training path (it carries the softmax backward for the joint loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_argmax(planes: jax.Array, center_grid: jax.Array, beta: float):
    """planes: (3, P, N, J) flattened plane heatmaps;
    center_grid: (3, N, 2) mm coordinates.

    Returns (coords (3, P, J, 2), confs (P,)).
    """
    logits = beta * planes.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=2)          # (3, P, N, J)
    confs = jnp.mean(jnp.max(probs, axis=2), axis=(0, 2))   # (P,)
    coords = jnp.einsum("spnj,snc->spjc", probs,
                        center_grid.astype(jnp.float32))
    return coords, confs
