"""Voxel-block spatial sharding (fvp_tpu/parallel/spatial.py) on the 8-device
virtual CPU mesh: halo-exchanged NMS parity, the seam-peak-detected-exactly-
once property (north star), and GSPMD conv equivalence for the CenterNet
over a spatially-sharded BEV map."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fvp_tpu.models.cnns import CenterNet
from fvp_tpu.ops.nms import nms_topk_2d
from fvp_tpu.parallel.spatial import (
    make_spatial_mesh, sharded_nms_topk_2d, spatial_sharding_constraint,
)


def test_sharded_nms_matches_single_device(rng):
    mesh = make_spatial_mesh(8)
    B, X, Y, K = 3, 80, 80, 10
    hm = jnp.asarray(rng.rand(B, X, Y).astype(np.float32))

    v_ref, xy_ref, flat_ref = jax.vmap(
        lambda m: nms_topk_2d(m, K))(hm)
    v, xy, flat = sharded_nms_topk_2d(mesh, hm, K)

    np.testing.assert_array_equal(np.asarray(flat), np.asarray(flat_ref))
    np.testing.assert_array_equal(np.asarray(xy), np.asarray(xy_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-6)


def test_sharded_nms_handles_negative_maps(rng):
    """Outer-boundary halos must be -inf (not zero), or negative edge values
    are wrongly suppressed/kept."""
    mesh = make_spatial_mesh(8)
    hm = jnp.asarray(rng.randn(2, 80, 80).astype(np.float32))  # +/- values
    v_ref, _, flat_ref = jax.vmap(lambda m: nms_topk_2d(m, 6))(hm)
    v, _, flat = sharded_nms_topk_2d(mesh, hm, 6)
    np.testing.assert_array_equal(np.asarray(flat), np.asarray(flat_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), rtol=1e-6)


def test_seam_peak_detected_exactly_once():
    """North-star seam property: a Gaussian peak whose center cell sits on a
    shard boundary row is detected exactly once — the halo lets both
    neighbors see it, so neither emits a duplicate."""
    mesh = make_spatial_mesh(8)
    X = Y = 80                     # 8 blocks of 10 rows; seams at x=10k
    for seam_x in (10, 40, 70):    # boundary row of blocks 1, 4, 7
        cy = 33
        xs, ys = np.meshgrid(np.arange(X), np.arange(Y), indexing="ij")
        hm = np.exp(-((xs - seam_x) ** 2 + (ys - cy) ** 2) / (2 * 2.0 ** 2))
        hm = jnp.asarray(hm[None].astype(np.float32))

        vals, xy, _ = sharded_nms_topk_2d(mesh, hm, 10)
        detections = np.asarray(vals[0]) > 0.5
        assert detections.sum() == 1, (seam_x, np.asarray(vals[0]))
        assert tuple(np.asarray(xy[0, 0])) == (seam_x, cy)

        # and the peak straddling the seam the other way: center one row
        # above the boundary (window reaches into the next block)
        hm2 = np.exp(-((xs - (seam_x - 1)) ** 2 + (ys - cy) ** 2)
                     / (2 * 2.0 ** 2))
        vals2, xy2, _ = sharded_nms_topk_2d(
            mesh, jnp.asarray(hm2[None].astype(np.float32)), 10)
        assert (np.asarray(vals2[0]) > 0.5).sum() == 1
        assert tuple(np.asarray(xy2[0, 0])) == (seam_x - 1, cy)


def test_spatially_sharded_conv_equivalence(rng):
    """CenterNet over a BEV volume sharded on x must equal the unsharded
    run — GSPMD inserts the conv halo exchanges (7x7 front conv needs a
    3-row halo)."""
    mesh = make_spatial_mesh(8)
    cn = CenterNet()
    vol = jnp.asarray(rng.rand(1, 80, 80, 8, 15).astype(np.float32))
    variables = cn.init(jax.random.PRNGKey(0), vol, train=False)

    hm_ref, size_ref = jax.jit(
        lambda v: cn.apply(variables, v, train=False))(vol)

    with mesh:
        def fwd(v):
            v = spatial_sharding_constraint(v, mesh, axis=1)
            return cn.apply(variables, v, train=False)

        vol_sharded = jax.device_put(
            vol, NamedSharding(mesh, P(None, "space")))
        hm_s, size_s = jax.jit(fwd)(vol_sharded)

    np.testing.assert_allclose(np.asarray(hm_s), np.asarray(hm_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(size_s), np.asarray(size_ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_pipeline_end_to_end_matches_single_device(rng):
    """The whole eval forward (sampler -> CenterNet -> NMS -> C2C -> JLN ->
    fusion) under a ('data', 'space') pipeline mesh equals the single-device
    model with the same variables — spatial sharding as a pipeline
    configuration, not just a standalone op (VERDICT r3 item 3)."""
    from fvp_tpu.config import FVPConfig
    from fvp_tpu.geometry.cameras import default_ring_rig
    from fvp_tpu.geometry.grids import build_rig_constants
    from fvp_tpu.models.faster_voxelpose import FasterVoxelPose
    from fvp_tpu.parallel.spatial import (
        make_pipeline_mesh, make_spatial_eval_step,
    )

    cfg = FVPConfig(
        num_joints=15, num_views=3, heatmap_size=(60, 32),
        voxels_per_axis=(32, 32, 8), ind_voxels_per_axis=(16, 16, 16),
        max_people=4, min_score=0.0, sampling_backend="exact")
    rig = default_ring_rig(cfg.num_views, cfg.space_center,
                           cfg.ori_image_size)
    rc = jax.tree_util.tree_map(jnp.asarray, build_rig_constants(cfg, rig))

    B = 2
    heatmaps = jnp.asarray(rng.rand(
        B, cfg.num_views, cfg.num_joints, 32, 60).astype(np.float32))

    plain = FasterVoxelPose(cfg=cfg)
    variables = plain.init(jax.random.PRNGKey(0), heatmaps, rc, train=False)
    ref_out = jax.jit(
        lambda v, h: plain.apply(v, h, rc, train=False)["fused_poses"]
    )(variables, heatmaps)

    mesh = make_pipeline_mesh(2, 4)          # 8 CPU devices: 2 data x 4 space
    sharded = FasterVoxelPose(cfg=cfg, spatial_mesh=mesh)
    step = make_spatial_eval_step(cfg, sharded, mesh)
    out = step(variables, heatmaps, rc)

    assert out.shape == ref_out.shape
    # proposal selection (match flag + score channels) must agree exactly...
    np.testing.assert_array_equal(np.asarray(out[..., 3]),
                                  np.asarray(ref_out[..., 3]))
    # ...and coordinates to float tolerance (GSPMD may re-associate conv
    # accumulations across seams)
    np.testing.assert_allclose(np.asarray(out[..., :3]),
                               np.asarray(ref_out[..., :3]),
                               rtol=1e-4, atol=5e-3)
