"""NMS/top-K and soft-argmax parity vs torch implementations of the
reference math (proposal.py:13-76, joint_localization_net.py:15-56)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from fvp_tpu.ops.nms import maxpool_nms_2d, nms_topk_2d
from fvp_tpu.ops.softargmax import soft_argmax


def _torch_nms(hm: np.ndarray, max_num: int):
    t = torch.from_numpy(hm)[None, None]
    m = F.max_pool2d(t, kernel_size=3, stride=1, padding=1)
    keep = (t == m).float() * t
    vals, flat = keep.reshape(1, -1).topk(max_num)
    x = torch.div(flat, hm.shape[1], rounding_mode="trunc")
    y = flat % hm.shape[1]
    return (vals[0].numpy(), np.stack([x[0].numpy(), y[0].numpy()], 1),
            flat[0].numpy())


def test_nms_matches_torch(rng):
    hm = rng.rand(80, 80).astype(np.float32)
    vals_t, xy_t, flat_t = _torch_nms(hm, 10)
    vals, xy, flat = nms_topk_2d(jnp.asarray(hm), 10)
    np.testing.assert_allclose(np.asarray(vals), vals_t, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(flat), flat_t)
    np.testing.assert_array_equal(np.asarray(xy), xy_t)


def test_nms_keeps_ties(rng):
    hm = np.zeros((8, 8), np.float32)
    hm[2, 2] = hm[2, 3] = 0.5   # plateau: both survive in reference semantics
    keep = np.asarray(maxpool_nms_2d(jnp.asarray(hm)))
    assert keep[2, 2] == 0.5 and keep[2, 3] == 0.5


def test_nms_suppresses_nonmax(rng):
    hm = np.zeros((8, 8), np.float32)
    hm[4, 4] = 1.0
    hm[4, 5] = 0.9
    keep = np.asarray(maxpool_nms_2d(jnp.asarray(hm)))
    assert keep[4, 4] == 1.0 and keep[4, 5] == 0.0


def _torch_soft_argmax(planes: np.ndarray, grids: np.ndarray, beta: float):
    """Reference math (joint_localization_net.py:44-56): x shaped
    (3, P, J, N, 1), softmax over N, conf = mean over planes and joints of
    per-map max, coords = expectation against grids."""
    x = torch.from_numpy(planes)          # (3, P, N, J)
    x = x.permute(0, 1, 3, 2).unsqueeze(-1)   # (3, P, J, N, 1)
    x = F.softmax(beta * x, dim=3)
    confs, _ = torch.max(x, dim=3)
    confs = torch.mean(confs.squeeze(3), dim=(0, 2))
    g = torch.from_numpy(grids).reshape(3, 1, 1, -1, 2)
    coords = torch.sum(x * g, dim=3)
    return coords.numpy(), confs.numpy()


def test_soft_argmax_matches_torch(rng):
    P, N, J = 3, 64, 5
    planes = rng.rand(3, P, N, J).astype(np.float32)
    grids = rng.uniform(-1000, 1000, (3, N, 2)).astype(np.float32)
    coords, confs = soft_argmax(jnp.asarray(planes), jnp.asarray(grids),
                                beta=100.0)
    exp_coords, exp_confs = _torch_soft_argmax(planes, grids, 100.0)
    np.testing.assert_allclose(np.asarray(coords), exp_coords, atol=2e-3)
    np.testing.assert_allclose(np.asarray(confs), exp_confs, atol=1e-5)


def test_soft_argmax_peaked_recovers_position(rng):
    # a delta heatmap should decode to the grid position of the peak
    N = 16 * 16
    planes = np.zeros((3, 1, N, 1), np.float32)
    peak = 37
    planes[:, 0, peak, 0] = 1.0
    grids = rng.uniform(-1000, 1000, (3, N, 2)).astype(np.float32)
    coords, _ = soft_argmax(jnp.asarray(planes), jnp.asarray(grids), 100.0)
    np.testing.assert_allclose(np.asarray(coords[0, 0, 0]), grids[0, peak],
                               atol=2.0)
