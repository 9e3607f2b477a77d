"""Device meshes for the pose engine.

Axes:
  'data' — batch (data parallelism; frames are independent)
  'view' — cameras (view parallelism: each device holds a subset of views'
           backbone + heatmap sampling; the whole-space volume mean-over-views
           becomes a psum-style collective over this axis, riding ICI)

The reference has no multi-device runtime at all (SURVEY.md §2.3); this
module is the from-scratch TPU-native scaling layer demanded by the north
star: mesh + sharding annotations, XLA GSPMD inserts the collectives
(including halo exchanges for spatially-sharded convs / NMS windows).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def pick_mesh_shape(n_devices: int, num_views: int = 0) -> tuple[int, int]:
    """(data, view) factorization of n_devices. Prefers a view axis that
    divides the camera count; falls back to pure data parallelism."""
    for view in range(min(n_devices, max(num_views, 1)), 0, -1):
        if n_devices % view == 0 and (num_views == 0
                                      or num_views % view == 0):
            return n_devices // view, view
    return n_devices, 1


def make_mesh(n_data: int, n_view: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_view
    assert len(devices) >= n, (len(devices), n)
    grid = np.asarray(devices[:n]).reshape(n_data, n_view)
    return Mesh(grid, axis_names=("data", "view"))
