#!/usr/bin/env python
"""Round-4 same-run kernel A/Bs (run on the real chip):

  1. person-cube sampler, occupancy gating ON vs OFF, on REALISTIC
     sparse heatmaps (rendered synthetic scene — Gaussian blobs on a
     hard-zero field, exactly what gt/pred-source serving feeds) and on
     dense rand heatmaps (worst case: gating pays its checks, skips
     nothing);
  2. whole-space sampler, same A/B;
  3. C2CNet / P2PNet / CenterNet: XLA module vs fused Pallas kernel with
     pre-packed weights (engine/packing.py) — re-running the round-3 A/Bs
     that the per-call packing cost decided.

All timings are same-run (the tunneled chip's cross-run variance swamps
cross-process comparisons — NOTES_ROUND3.md).

Usage: python tools/microbench_r4.py [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)


def timeit(fn, *args, iters=50, warmup=3):
    import jax.numpy as jnp

    def fence(out):
        while isinstance(out, (tuple, list)):
            out = out[0]
        return float(jnp.asarray(out).ravel()[0])

    for _ in range(warmup):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    if os.environ.get("FVP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["FVP_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import functools

    import jax.numpy as jnp

    from __graft_entry__ import _panoptic_rig
    from fvp_tpu.config import FVPConfig
    from fvp_tpu.data.synthetic import SyntheticDataset
    from fvp_tpu.geometry.grids import build_rig_constants

    interp = jax.default_backend() != "tpu"
    cfg = FVPConfig(compute_dtype="bfloat16")
    rig = _panoptic_rig(cfg.num_views, cfg)
    rc = jax.tree_util.tree_map(jnp.asarray, build_rig_constants(cfg, rig))
    rng = np.random.RandomState(0)

    # --- inputs: realistic sparse heatmaps from a rendered scene ---------
    ds = SyntheticDataset(cfg.replace(synthetic_num_data=4,
                                      synthetic_max_people=5,
                                      synthetic_augmentation=False,
                                      train_heatmap_src="gt",
                                      device_render=False),
                          rig, seed=11)
    s = ds.sample(0, rng=np.random.RandomState(0))
    hm_scene = jnp.asarray(s["input_heatmaps"])[None]       # (1, V, J, h, w)
    npers = int(s["meta"]["num_person"])
    K = cfg.max_people
    centers = np.zeros((1, K, 3), np.float32)
    centers[0, :npers] = np.asarray(s["meta"]["roots_3d"])[:npers]
    centers[0, npers:] = rng.uniform(-3000, 3000, (K - npers, 3))
    centers = jnp.asarray(centers)
    bbox = jnp.asarray(np.maximum(
        np.asarray(s["meta"]["bbox"]), 500.0).astype(np.float32))[None][0]
    bbox = jnp.broadcast_to(bbox.reshape(1, K, 2), (1, K, 2))
    mask = jnp.ones((1, K), bool)
    hm_dense = jnp.asarray(
        rng.rand(*hm_scene.shape).astype(np.float32))
    log(f"scene: {npers} people; heatmap nonzero fraction "
        f"{float(jnp.mean((hm_scene > 0))):.3f}")

    from fvp_tpu.ops.fast_sampling import (
        project_whole_pallas_batched, sample_person_planes_pallas_batched,
    )
    from fvp_tpu.ops.pallas import sampler as sampler_mod

    def person(hm, occ):
        orig = sampler_mod.pallas_tiled_sample_project
        sampler_mod.pallas_tiled_sample_project = functools.partial(
            orig, occupancy=occ)
        try:
            fn = jax.jit(lambda h: sample_person_planes_pallas_batched(
                h, rc, cfg, centers, bbox, person_mask=mask,
                band_height=cfg.jln_band_height, interpret=interp)[0])
            return timeit(fn, hm, iters=args.iters)
        finally:
            sampler_mod.pallas_tiled_sample_project = orig

    def whole(hm, occ):
        orig = sampler_mod.pallas_tiled_sample
        sampler_mod.pallas_tiled_sample = functools.partial(
            orig, occupancy=occ)
        try:
            fn = jax.jit(lambda h: project_whole_pallas_batched(
                h, rc, cfg, band_height=cfg.whole_band_height,
                interpret=interp))
            return timeit(fn, hm, iters=args.iters)
        finally:
            sampler_mod.pallas_tiled_sample = orig

    for name, hm in (("scene", hm_scene), ("dense", hm_dense)):
        t_off = person(hm, False)
        t_on = person(hm, True)
        log(f"person sampler [{name}]: occupancy OFF {t_off:.3f} ms | "
            f"ON {t_on:.3f} ms ({t_off / t_on:.2f}x)")
    for name, hm in (("scene", hm_scene), ("dense", hm_dense)):
        t_off = whole(hm, False)
        t_on = whole(hm, True)
        log(f"whole sampler  [{name}]: occupancy OFF {t_off:.3f} ms | "
            f"ON {t_on:.3f} ms ({t_off / t_on:.2f}x)")

    # --- conv tail: XLA vs packed-fused ---------------------------------
    from fvp_tpu.models.cnns import C2CNet, CenterNet, P2PNet
    from fvp_tpu.ops.pallas.hourglass import (
        pack_c2cnet, pack_centernet, pack_p2pnet, pallas_c2cnet,
        pallas_centernet, pallas_p2pnet,
    )

    key = jax.random.PRNGKey(0)
    B, J = 1, cfg.num_joints
    nx, ny, nz = cfg.voxels_per_axis

    # C2C at serving shape (B*K z-columns)
    cols = jnp.asarray(rng.rand(B * K, nz, J).astype(np.float32))
    c2c = C2CNet(dtype=jnp.bfloat16)
    cv = c2c.init(key, cols, False)
    t_xla = timeit(jax.jit(lambda x: c2c.apply(cv, x, False)), cols,
                   iters=args.iters)
    packed = jax.jit(pack_c2cnet)(cv)
    t_fp = timeit(jax.jit(lambda x: pallas_c2cnet(
        cv, x, interpret=interp, packed=packed)), cols, iters=args.iters)
    t_fu = timeit(jax.jit(lambda x: pallas_c2cnet(
        cv, x, interpret=interp)), cols, iters=args.iters)
    log(f"C2CNet: XLA {t_xla:.3f} | fused+packed {t_fp:.3f} | "
        f"fused-inline {t_fu:.3f} ms")

    # P2P at serving shape (3*B*K plane stacks)
    planes = jnp.asarray(rng.rand(3 * B * K, nx, nx, J).astype(np.float32))
    p2p = P2PNet(num_joints=J, dtype=jnp.bfloat16)
    pv = p2p.init(key, planes, False)
    t_xla = timeit(jax.jit(lambda x: p2p.apply(pv, x, False)), planes,
                   iters=args.iters)
    packedp = jax.jit(pack_p2pnet)(pv)
    t_fp = timeit(jax.jit(lambda x: pallas_p2pnet(
        pv, x, J, interpret=interp, packed=packedp)), planes,
        iters=args.iters)
    t_fu = timeit(jax.jit(lambda x: pallas_p2pnet(
        pv, x, J, interpret=interp)), planes, iters=args.iters)
    log(f"P2PNet: XLA {t_xla:.3f} | fused+packed {t_fp:.3f} | "
        f"fused-inline {t_fu:.3f} ms")

    # CenterNet on the BEV
    vol = jnp.asarray(rng.rand(B, nx, ny, nz, J).astype(np.float32))
    cn = CenterNet(dtype=jnp.bfloat16)
    cnv = cn.init(key, vol, False)
    bev = jnp.max(vol, axis=3)
    t_xla = timeit(jax.jit(lambda x: cn.apply(cnv, x, False)[0]), vol,
                   iters=args.iters)
    packedc = jax.jit(pack_centernet)(cnv)
    t_fp = timeit(jax.jit(lambda x: pallas_centernet(
        cnv, x, interpret=interp, packed=packedc)[0]), bev,
        iters=args.iters)
    t_fu = timeit(jax.jit(lambda x: pallas_centernet(
        cnv, x, interpret=interp)[0]), bev, iters=args.iters)
    log(f"CenterNet: XLA(+zmax) {t_xla:.3f} | fused+packed {t_fp:.3f} | "
        f"fused-inline {t_fu:.3f} ms")

    # --- stem: XLA vs Pallas host-s2d at 12 vs 16 lanes -----------------
    from flax import linen as nn

    from fvp_tpu.ops.pallas.stem import pallas_stem, s2d_host

    V = cfg.num_views
    w_img, h_img = cfg.image_size
    imgs = rng.rand(V, h_img, w_img, 3).astype(np.float32)
    kern7 = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05)
    aff = jnp.asarray(np.stack([np.ones(64), np.zeros(64)])
                      .astype(np.float32))

    @jax.jit
    def stem_xla(x):
        h = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), kern7.astype(jnp.bfloat16),
            (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jnp.maximum(h * aff[0] + aff[1], 0.0)
        return nn.max_pool(h, (3, 3), (2, 2), "SAME")

    t_xla = timeit(stem_xla, jnp.asarray(imgs), iters=args.iters)
    for ch in (12, 16):
        xs = jnp.asarray(s2d_host(imgs, channels=ch))
        t_p = timeit(jax.jit(lambda x: pallas_stem(
            x, kern7, aff, interpret=interp)), xs, iters=args.iters)
        log(f"stem[{ch}ch]: XLA {t_xla:.3f} | pallas host-s2d {t_p:.3f} ms")


if __name__ == "__main__":
    main()
