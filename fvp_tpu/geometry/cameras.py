"""Pinhole camera model with radial + tangential distortion.

World->pixel projection math matches the reference implementation
(/root/reference/lib/utils/cameras.py:30-56): rotate into camera frame,
perspective divide with a 1e-5 z-guard, apply the Brown-Conrady distortion
polynomial (k1,k2,k3 radial; p1,p2 tangential), then focal/principal mapping.

Two implementations are provided:
  * `project_points`     — jnp, batched over an arbitrary leading point axis,
                           used on-device inside the jitted pipeline.
  * `project_points_np`  — numpy oracle for tests and host-side data prep
                           (mirrors the reference's dual torch/numpy pattern,
                           cameras.py:58-84).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class CameraRig:
    """Struct-of-arrays camera parameters for V cameras of one rig.

    R: (V, 3, 3) world->camera rotation
    T: (V, 3)    camera position in world coordinates (mm)
    f: (V, 2)    focal lengths (fx, fy)
    c: (V, 2)    principal point (cx, cy)
    k: (V, 3)    radial distortion (k1, k2, k3)
    p: (V, 2)    tangential distortion (p1, p2)
    """

    R: Any
    T: Any
    f: Any
    c: Any
    k: Any
    p: Any

    @property
    def num_cameras(self) -> int:
        return self.R.shape[0]

    @staticmethod
    def from_dicts(cams: Sequence[Mapping[str, Any]]) -> "CameraRig":
        """Build a rig from reference-style per-camera dicts with keys
        R (3,3), T (3,1) or (3,), fx, fy, cx, cy, k (3,1), p (2,1)."""
        def arr(x):
            return np.asarray(x, dtype=np.float64)

        R = np.stack([arr(c["R"]).reshape(3, 3) for c in cams])
        T = np.stack([arr(c["T"]).reshape(3) for c in cams])
        f = np.stack([np.array([float(np.asarray(c["fx"]).reshape(())),
                                float(np.asarray(c["fy"]).reshape(()))])
                      for c in cams])
        cc = np.stack([np.array([float(np.asarray(c["cx"]).reshape(())),
                                 float(np.asarray(c["cy"]).reshape(()))])
                       for c in cams])
        k = np.stack([arr(c["k"]).reshape(3) for c in cams])
        p = np.stack([arr(c["p"]).reshape(2) for c in cams])
        return CameraRig(R=R, T=T, f=f, c=cc, k=k, p=p)

    def astype(self, dtype) -> "CameraRig":
        return CameraRig(*(np.asarray(x, dtype=dtype) for x in
                           (self.R, self.T, self.f, self.c, self.k, self.p)))

    def camera(self, i: int) -> dict[str, np.ndarray]:
        """Single camera as a reference-style dict (for the numpy oracle)."""
        return {
            "R": np.asarray(self.R[i]),
            "T": np.asarray(self.T[i]).reshape(3, 1),
            "fx": np.asarray(self.f[i, 0]),
            "fy": np.asarray(self.f[i, 1]),
            "cx": np.asarray(self.c[i, 0]),
            "cy": np.asarray(self.c[i, 1]),
            "k": np.asarray(self.k[i]).reshape(3, 1),
            "p": np.asarray(self.p[i]).reshape(2, 1),
        }


def default_ring_rig(num_views: int, space_center, ori_image_size,
                     radius: float = 4500.0, height: float = 2200.0,
                     focal: float = 1500.0, seed: int = 7) -> "CameraRig":
    """Deterministic inward-looking camera ring — the fallback rig for
    synthetic data, demos and benchmarks when no calibration is on disk."""
    rng = np.random.RandomState(seed)
    center = np.asarray(space_center, np.float64)
    cams = []
    for v in range(num_views):
        ang = 2 * np.pi * v / num_views
        pos = center + np.array([radius * np.cos(ang),
                                 radius * np.sin(ang), height])
        fwd = center + np.array([0.0, 0.0, 900.0]) - pos
        fwd /= np.linalg.norm(fwd)
        up = np.array([0.0, 0.0, -1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        cams.append({
            "R": np.stack([right, down, fwd]),
            "T": pos.reshape(3, 1),
            "fx": focal, "fy": focal,
            "cx": ori_image_size[0] / 2.0,
            "cy": ori_image_size[1] / 2.0,
            "k": rng.uniform(-0.1, 0.1, (3, 1)) * [[1], [0.1], [0.01]],
            "p": rng.uniform(-0.005, 0.005, (2, 1)),
        })
    return CameraRig.from_dicts(cams)


def _distort(yx, yy, k, p):
    r2 = yx * yx + yy * yy
    d = 1.0 + r2 * (k[0] + r2 * (k[1] + r2 * k[2]))
    u = yx * d + 2.0 * p[0] * yx * yy + p[1] * (r2 + 2.0 * yx * yx)
    v = yy * d + 2.0 * p[1] * yx * yy + p[0] * (r2 + 2.0 * yy * yy)
    return u, v


def project_points_uv(px, py, pz, R, T, f, c, k, p):
    """Project world points given as separate (N,) coordinate arrays ->
    (u (N,), v (N,)) pixels.

    TPU layout note: this structure-of-arrays form is the on-device fast
    path — any array with a minor dimension of 2 gets lane-padded 64x on
    TPU, which made the (N, 2) formulation ~50x slower than the math costs.
    """
    wx, wy, wz = px - T[0], py - T[1], pz - T[2]
    xc = R[0, 0] * wx + R[0, 1] * wy + R[0, 2] * wz
    yc = R[1, 0] * wx + R[1, 1] * wy + R[1, 2] * wz
    zc = R[2, 0] * wx + R[2, 1] * wy + R[2, 2] * wz + 1e-5
    yx = xc / zc
    yy = yc / zc
    u, v = _distort(yx, yy, k, p)
    return f[0] * u + c[0], f[1] * v + c[1]


def project_points(points, R, T, f, c, k, p):
    """Project world points (..., 3) through one camera -> pixel (..., 2)."""
    u, v = project_points_uv(points[..., 0], points[..., 1], points[..., 2],
                             R, T, f, c, k, p)
    return jnp.stack([u, v], axis=-1)


def project_points_rig(points, rig: CameraRig):
    """Project world points (..., 3) through all V cameras -> (V, ..., 2)."""
    return jax.vmap(
        lambda R, T, f, c, k, p: project_points(points, R, T, f, c, k, p)
    )(rig.R, rig.T, rig.f, rig.c, rig.k, rig.p)


def project_points_np(points: np.ndarray, cam: Mapping[str, Any],
                      dtype=np.float64) -> np.ndarray:
    """Numpy oracle: world points (N, 3) -> pixel (N, 2)."""
    R = np.asarray(cam["R"], dtype=dtype)
    T = np.asarray(cam["T"], dtype=dtype).reshape(3, 1)
    f = np.array([cam["fx"], cam["fy"]], dtype=dtype).reshape(2, 1)
    c = np.array([cam["cx"], cam["cy"]], dtype=dtype).reshape(2, 1)
    k = np.asarray(cam["k"], dtype=dtype).reshape(3)
    p = np.asarray(cam["p"], dtype=dtype).reshape(2)

    xcam = R @ (points.astype(dtype).T - T)              # (3, N)
    y = xcam[:2] / (xcam[2] + 1e-5)
    r2 = np.sum(y ** 2, axis=0)
    d = 1.0 + k[0] * r2 + k[1] * r2 ** 2 + k[2] * r2 ** 3
    u = y[0] * d + 2 * p[0] * y[0] * y[1] + p[1] * (r2 + 2 * y[0] ** 2)
    v = y[1] * d + 2 * p[1] * y[0] * y[1] + p[0] * (r2 + 2 * y[1] ** 2)
    pix = f * np.stack([u, v]) + c
    return pix.T
