"""The end-to-end Faster-VoxelPose model: HDN + JLN as one fully-batched,
fixed-shape, jittable function.

Behavioral reference: /root/reference/lib/models/faster_voxelpose.py:51-162,
human_detection_net.py:14-220, joint_localization_net.py:59-181. The
reference's per-batch-item and per-person Python loops
(joint_localization_net.py:148, project_individual.py:272) are replaced by
vmapped fixed-shape computation over [batch, max_people]; GT matching and
proposal filtering are functional (no in-place mutation).

Data flow (all under one jit):
  heatmaps (B, V, J, H, W)
    -> whole-space volumes (B, X, Y, Z, J)        [gather-sample + view mean]
    -> CenterNet -> BEV center heatmap + bbox sizes
    -> NMS top-K -> proposal (x, y) + z-columns -> C2CNet -> z
    -> proposals (B, K, 7) [xyz mm, match, conf, bbox wh]
    -> per-person cubes (B, K, 64^3, J)           [on-the-fly projection]
    -> tri-plane collapse -> P2PNet -> soft-argmax -> WeightNet fusion
    -> fused poses (B, K, J, 5) [xyz mm, match, score]
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fvp_tpu.config import FVPConfig
from fvp_tpu.geometry.grids import RigConstants
from fvp_tpu.models.cnns import C2CNet, CenterNet, P2PNet, WeightNet
from fvp_tpu.ops.nms import nms_topk_2d
from fvp_tpu.ops.sampling import (
    collapse_planes, project_whole, sample_person_cubes,
)
from fvp_tpu.ops.softargmax import soft_argmax


def use_pallas_sampling(cfg: FVPConfig) -> bool:
    """Resolve the sampling backend: the Pallas MXU kernel on TPU (the
    gather path runs at DMA latency there — see ops/pallas/sampler.py),
    the exact XLA-gather path elsewhere."""
    if cfg.sampling_backend == "pallas":
        return True
    if cfg.sampling_backend == "exact":
        return False
    return jax.default_backend() == "tpu"


def voxel_to_mm(cfg: FVPConfig):
    """Coarse voxel index -> world mm affine (human_detection_net.py:36-37)."""
    import numpy as np
    space = np.asarray(cfg.space_size, np.float32)
    vox = np.asarray(cfg.voxels_per_axis, np.float32)
    center = np.asarray(cfg.space_center, np.float32)
    scale = space / (vox - 1.0)
    bias = center - space / 2.0
    return jnp.asarray(scale), jnp.asarray(bias)


def match_proposals_to_gt(centers_mm, bbox_preds, roots_3d, gt_bbox,
                          num_person, radius: float = 500.0,
                          bbox_slack: float = 0.1):
    """Vectorized GT matching (human_detection_net.py:39-80).

    centers_mm: (K, 3), bbox_preds: (K, 2), roots_3d: (G, 3) padded,
    gt_bbox: (G, 2), num_person: scalar int.
    Returns (proposal2gt (K,) float, adjusted_bbox (K, 2)).
    """
    G = roots_3d.shape[0]
    dist = jnp.sqrt(jnp.sum(
        (centers_mm[:, None, :] - roots_3d[None, :, :]) ** 2, axis=-1))
    gt_valid = jnp.arange(G) < num_person
    dist = jnp.where(gt_valid[None, :], dist, jnp.inf)
    min_gt = jnp.argmin(dist, axis=1)
    min_dist = jnp.min(dist, axis=1)
    proposal2gt = jnp.where(min_dist > radius, -1.0, min_gt.astype(jnp.float32))

    matched_gt_bbox = gt_bbox[min_gt]                        # (K, 2)
    # reference quirk: if ANY coordinate of the predicted bbox is below the
    # matched GT bbox minus slack, replace the WHOLE prediction with the GT
    too_small = jnp.any(bbox_preds < matched_gt_bbox - bbox_slack, axis=1)
    use_gt = (proposal2gt >= 0) & too_small
    adjusted = jnp.where(use_gt[:, None], matched_gt_bbox, bbox_preds)
    return proposal2gt, adjusted


class FasterVoxelPose(nn.Module):
    """HDN + JLN. `heatmaps` layout: (B, V, J, H, W).

    `spatial_mesh`: optional ('data', 'space') jax.sharding.Mesh. When set
    (and the 'space' axis is non-trivial), the whole-space volume and BEV
    maps are sharded over voxel x-row blocks: the sampler output gets a
    GSPMD sharding constraint, CenterNet is partitioned by GSPMD (XLA
    inserts the conv seam halos), and NMS+top-K runs through the explicit
    ppermute-halo shard_map (parallel/spatial.py). This is the framework's
    context-parallel axis — the reference's single-device 3x3 NMS
    (lib/core/proposal.py:49) and BEV z-collapse (lib/models/cnns_2d.py:291)
    are the ops whose seam semantics it preserves. Spatial configs use the
    XLA sampling path (GSPMD-partitionable); the Pallas kernels remain the
    single-chip serving path.
    """

    cfg: FVPConfig
    spatial_mesh: Optional[object] = None
    # Latency-mode tail sharding: when set (a jax.sharding.Mesh), the JLN's
    # per-person plane batch (3*B*K independent stacks) carries a GSPMD
    # sharding constraint over ALL the mesh's devices, so P2PNet /
    # soft-argmax / WeightNet parallelize instead of running replicated
    # after the view psum — the Amdahl limiter of pure view sharding
    # (docs/MULTIHOST_MODEL.md §3). Eval path only; persons are
    # embarrassingly parallel (reference loops them sequentially,
    # joint_localization_net.py:148).
    jln_mesh: Optional[object] = None

    def _spatial_active(self) -> bool:
        from fvp_tpu.parallel.spatial import spatial_size
        return spatial_size(self.spatial_mesh) > 1

    def _jln_shard(self, x):
        """Constrain a (3*B*K, ...) per-person-stack tensor to split its
        leading axis across every device of `jln_mesh`."""
        if self.jln_mesh is None or self.is_initializing():
            return x
        from jax.sharding import NamedSharding, PartitionSpec
        spec = PartitionSpec(tuple(self.jln_mesh.axis_names))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.jln_mesh, spec))

    def setup(self):
        dtype = jnp.dtype(self.cfg.compute_dtype)
        self.center_net = CenterNet(dtype=dtype)
        self.c2c_net = C2CNet(dtype=dtype)
        self.p2p_net = P2PNet(num_joints=self.cfg.num_joints, dtype=dtype)
        # explicit sampling_backend='pallas' forces the fused WeightNet
        # (interpret off-TPU) so tests/benches exercise the whole fused
        # path; 'auto' defers to WeightNet's own inference-on-TPU gate
        self.weight_net = WeightNet(
            feat_channels=self.cfg.num_channel_joint_feat,
            hidden_channels=self.cfg.num_channel_joint_hidden,
            dtype=dtype,
            use_pallas=True if self.cfg.sampling_backend == "pallas"
            else None)

    # ------------------------------------------------------------------
    def detect(self, heatmaps, rc: RigConstants, train: bool,
               meta: Optional[dict]):
        """HDN: heatmaps -> proposals. Returns dict with proposals and the
        raw maps needed by the training losses."""
        cfg = self.cfg
        B = heatmaps.shape[0]
        K = cfg.max_people
        nx, ny, nz = cfg.voxels_per_axis

        spatial = self._spatial_active()
        if use_pallas_sampling(cfg) and not spatial:
            from fvp_tpu.ops.fast_sampling import project_whole_pallas_batched
            volumes = project_whole_pallas_batched(
                heatmaps, rc, cfg, band_height=cfg.whole_band_height,
                interpret=jax.default_backend() != "tpu")
        else:
            volumes = jax.vmap(lambda h: project_whole(h, rc, cfg))(heatmaps)
        if spatial:
            from fvp_tpu.parallel.spatial import spatial_sharding_constraint
            # (B, X, Y, Z, J): split voxel x-rows across the 'space' axis
            volumes = spatial_sharding_constraint(
                volumes, self.spatial_mesh, axis=1)

        fuse_tail = (use_pallas_sampling(cfg) and not train and not spatial
                     and not self.is_initializing())
        from fvp_tpu.ops.pallas.hourglass import hourglass_supported
        if fuse_tail and hourglass_supported((nx, ny, 1)):
            # single-launch fused CenterNet (at B=1 serving shapes the XLA
            # module pays ~30 launches on idle hardware); same variables
            from fvp_tpu.ops.pallas.hourglass import pallas_centernet
            bev = jnp.max(volumes, axis=3)                   # (B, X, Y, J)
            hm2d, bbox_map = pallas_centernet(
                self.center_net.variables, bev,
                interpret=jax.default_backend() != "tpu",
                packed=self.center_net.variables.get(
                    "packed", {}).get("fused"))
        else:
            hm2d, bbox_map = self.center_net(volumes, train)
        # hm2d (B,X,Y,1), bbox_map (B,X,Y,2)

        if spatial:
            from fvp_tpu.parallel.spatial import sharded_nms_topk_2d
            confs2d, xy, flat = sharded_nms_topk_2d(
                self.spatial_mesh, jax.lax.stop_gradient(hm2d[..., 0]), K)
        else:
            confs2d, xy, flat = jax.vmap(
                lambda h: nms_topk_2d(h, K))(
                    jax.lax.stop_gradient(hm2d[..., 0]))

        bbox_flat = bbox_map.reshape(B, nx * ny, 2)
        match_bbox = jnp.take_along_axis(
            bbox_flat, flat[:, :, None], axis=1)             # (B, K, 2)

        # z-columns of the volume at each proposal's (x, y)
        vol_flat = volumes.reshape(B, nx * ny, nz, -1)
        columns = jnp.take_along_axis(
            vol_flat, flat[:, :, None, None], axis=1)        # (B, K, Z, J)
        if cfg.fuse_p2p and fuse_tail and nz % 4 == 0:
            # single-launch fused 1D net (items batched on sublanes).
            # OFF by default like fuse_p2p: the per-call weight packing
            # (~40 tiny XLA ops) costs what the single launch saves
            # (0.88 vs 0.66 ms measured on v5e) — kept for param-frozen
            # serving where packing could be hoisted.
            from fvp_tpu.ops.pallas.hourglass import pallas_c2cnet
            hm1d = pallas_c2cnet(
                self.c2c_net.variables,
                columns.reshape(B * K, nz, -1),
                interpret=jax.default_backend() != "tpu",
                packed=self.c2c_net.variables.get(
                    "packed", {}).get("fused")).reshape(B, K, nz)
        else:
            hm1d = self.c2c_net(
                columns.reshape(B * K, nz, -1), train).reshape(B, K, nz)

        hm1d_sg = jax.lax.stop_gradient(hm1d)
        z_idx = jnp.argmax(hm1d_sg, axis=2)                  # (B, K)
        confs1d = jnp.max(hm1d_sg, axis=2)

        scale, bias = voxel_to_mm(cfg)
        idx_xyz = jnp.concatenate(
            [xy, z_idx[:, :, None]], axis=2).astype(jnp.float32)
        centers_mm = idx_xyz * scale + bias                  # (B, K, 3)
        confs = confs2d * confs1d

        if train and meta is not None:
            proposal2gt, adj_bbox = jax.vmap(match_proposals_to_gt)(
                centers_mm, match_bbox, meta["roots_3d"], meta["bbox"],
                meta["num_person"])
        else:
            proposal2gt = (confs > cfg.min_score).astype(jnp.float32) - 1.0
            adj_bbox = match_bbox

        proposals = jnp.concatenate([
            centers_mm,                                      # 0:3 xyz mm
            proposal2gt[:, :, None],                         # 3 match idx
            confs[:, :, None],                               # 4 confidence
            adj_bbox,                                        # 5:7 bbox wh
        ], axis=2)

        return {
            "proposals": proposals,
            "hm2d": hm2d[..., 0],                            # (B, X, Y)
            "hm1d": hm1d,                                    # (B, K, Z)
            "bbox_flat": bbox_flat,                          # (B, X*Y, 2)
        }

    # ------------------------------------------------------------------
    def localize(self, heatmaps, rc: RigConstants, proposals, train: bool):
        """JLN: per-person cubes -> tri-plane soft-argmax -> fusion.

        Returns (fused (B, K, J, 3), planes (3, B, K, J, 2), confs (B, K)).
        """
        cfg = self.cfg
        B, K = proposals.shape[:2]
        J = cfg.num_joints
        nx = cfg.ind_voxels_per_axis[0]

        proposals = jax.lax.stop_gradient(proposals)
        centers = proposals[..., 0:3]
        bbox = proposals[..., 5:7]
        person_mask = proposals[..., 3] >= 0

        # under a spatial mesh everything runs on the GSPMD-partitionable
        # XLA paths (a pallas_call can't be partitioned by GSPMD)
        pallas = use_pallas_sampling(cfg) and not self._spatial_active()
        if pallas:
            from fvp_tpu.ops.fast_sampling import (
                sample_person_planes_pallas_batched,
            )
            planes, offsets = sample_person_planes_pallas_batched(
                heatmaps, rc, cfg, centers, bbox, person_mask=person_mask,
                band_height=cfg.jln_band_height,
                interpret=jax.default_backend() != "tpu")
        else:
            cubes, offsets = jax.vmap(
                lambda h, c, b: sample_person_cubes(h, rc, cfg, c, b)
            )(heatmaps, centers, bbox)
            if self.jln_mesh is not None and not self.is_initializing():
                # persons over the mesh too: the cube sampling/collapse is
                # the JLN's heaviest stage on the exact backend
                from jax.sharding import NamedSharding, PartitionSpec
                a0, a1 = self.jln_mesh.axis_names
                cubes = jax.lax.with_sharding_constraint(
                    cubes, NamedSharding(self.jln_mesh,
                                         PartitionSpec(a0, a1)))
            planes = collapse_planes(
                cubes.reshape(B * K, *cubes.shape[2:]))
        # planes: (3, BK, A, B, J); offsets: (B, K, 3)
        if train and not self.is_initializing():
            # The reference trains the JLN per batch item on ONLY that
            # scene's matched persons (joint_localization_net.py:148-175),
            # so its train-mode BN statistics are per-scene and never see
            # the fixed-K padding fvp carries for jit shapes. Reorder the
            # plane stacks scene-major and hand each net the per-scene
            # mask: MaskedBatchNorm then reproduces torch's statistics
            # (and sequential running updates) exactly — confirmed by the
            # lockstep A/B (tools/ab_lockstep.py, CORRECTNESS_r05.md).
            A1, B1 = planes.shape[2], planes.shape[3]
            pb = planes.reshape(3, B, K, A1, B1, J) \
                .transpose(1, 0, 2, 3, 4, 5).reshape(B * 3 * K, A1, B1, J)
            mask2d = jnp.broadcast_to(
                person_mask[:, None, :], (B, 3, K)).reshape(B, 3 * K)
            feats_b = self.p2p_net(pb, train, mask=mask2d)
            feats3 = feats_b.reshape(B, 3, K, nx, nx, J) \
                .transpose(1, 0, 2, 3, 4, 5).reshape(3, B * K, nx, nx, J)
            weights = self.weight_net(feats_b, train, mask=mask2d)
            weights = weights.reshape(B, 3, K, J, 1) \
                .transpose(1, 0, 2, 3, 4).reshape(3, B * K, J, 1)
            coords, confs = soft_argmax(
                feats3.reshape(3, B * K, nx * nx, J),
                rc.center_grid, cfg.beta)                    # (3, BK, J, 2)
            off = offsets.reshape(B * K, 1, 3)
            coords = jnp.stack([
                coords[0] + off[..., 0:2],                   # xy plane
                coords[1] + off[..., ::2],                   # xz plane
                coords[2] + off[..., 1:],                    # yz plane
            ])
            fused = self._fuse(coords, weights)              # (BK, J, 3)
            return (fused.reshape(B, K, J, 3),
                    coords.reshape(3, B, K, J, 2),
                    confs.reshape(B, K))

        flat_planes = self._jln_shard(
            planes.reshape(3 * B * K, *planes.shape[2:]))
        from fvp_tpu.ops.pallas.hourglass import hourglass_supported
        if (cfg.fuse_p2p and pallas and not train
                and not self.is_initializing()
                and hourglass_supported(flat_planes.shape)):
            # fused single-launch hourglass (reads the same variables as
            # the flax module -> checkpoints unchanged). OFF by default:
            # at N=3*B*K plane stacks XLA already amortizes its launch
            # overhead and the kernel's per-conv VMEM shift copies make
            # it slightly slower (2.9 vs 2.2 ms measured on v5e) — kept
            # for small-N serving and as the CenterNet/C2C template.
            from fvp_tpu.ops.pallas.hourglass import pallas_p2pnet
            feats = pallas_p2pnet(
                self.p2p_net.variables, flat_planes, J,
                interpret=jax.default_backend() != "tpu",
                packed=self.p2p_net.variables.get(
                    "packed", {}).get("fused"))
        else:
            feats = self.p2p_net(flat_planes, train)
        feats = self._jln_shard(feats)
        feats3 = feats.reshape(3, B * K, nx, nx, J)

        if pallas and not train:
            # fused single-pass kernel; inference only (the XLA path below
            # provides the softmax backward for the joint loss)
            from fvp_tpu.ops.pallas.softargmax import pallas_soft_argmax
            coords, confs = pallas_soft_argmax(
                feats3.reshape(3, B * K, nx * nx, J),
                rc.center_grid, cfg.beta,
                interpret=jax.default_backend() != "tpu")    # (3, BK, J, 2)
        else:
            coords, confs = soft_argmax(
                feats3.reshape(3, B * K, nx * nx, J),
                rc.center_grid, cfg.beta)                    # (3, BK, J, 2)

        off = offsets.reshape(B * K, 1, 3)
        coords = jnp.stack([
            coords[0] + off[..., 0:2],                       # xy plane
            coords[1] + off[..., ::2],                       # xz plane
            coords[2] + off[..., 1:],                        # yz plane
        ])

        weights = self.weight_net(
            self._jln_shard(feats3.reshape(3 * B * K, nx, nx, J)),
            train)                                           # (3BK, J, 1)
        weights = weights.reshape(3, B * K, J, 1)
        fused = self._fuse(coords, weights)                  # (BK, J, 3)

        return (fused.reshape(B, K, J, 3),
                coords.reshape(3, B, K, J, 2),
                confs.reshape(B, K))

    @staticmethod
    def _fuse(coords, weights):
        """Weighted per-axis fusion of the three plane estimates
        (joint_localization_net.py:83-120)."""
        xy_w, xz_w, yz_w = weights[0], weights[1], weights[2]
        xy, xz, yz = coords[0], coords[1], coords[2]

        x_w = jnp.concatenate([xy_w, xz_w], axis=2)
        y_w = jnp.concatenate([xy_w, yz_w], axis=2)
        z_w = jnp.concatenate([xz_w, yz_w], axis=2)
        x_w = x_w / jnp.sum(x_w, axis=2, keepdims=True)
        y_w = y_w / jnp.sum(y_w, axis=2, keepdims=True)
        z_w = z_w / jnp.sum(z_w, axis=2, keepdims=True)

        x = x_w[:, :, :1] * xy[:, :, :1] + x_w[:, :, 1:] * xz[:, :, :1]
        y = y_w[:, :, :1] * xy[:, :, 1:] + y_w[:, :, 1:] * yz[:, :, :1]
        z = z_w[:, :, :1] * xz[:, :, 1:] + z_w[:, :, 1:] * yz[:, :, 1:]
        return jnp.concatenate([x, y, z], axis=2)

    # ------------------------------------------------------------------
    def __call__(self, heatmaps, rc: RigConstants, train: bool = False,
                 meta: Optional[dict] = None):
        cfg = self.cfg
        B = heatmaps.shape[0]
        J = cfg.num_joints

        det = self.detect(heatmaps, rc, train, meta)
        proposals = det["proposals"]
        mask = proposals[..., 3] >= 0                        # (B, K)

        fused, planes, jln_confs = self.localize(
            heatmaps, rc, proposals, train)

        # reference zeroes outputs of unmatched people and overwrites the
        # confidence of matched ones with the JLN peakiness score
        fmask = mask[..., None, None].astype(fused.dtype)
        fused = fused * fmask
        planes = planes * fmask[None]
        new_conf = jnp.where(mask, jln_confs, proposals[..., 4])
        proposals = proposals.at[..., 4].set(new_conf)

        # append (match idx, score) channels -> (B, K, J, 5)
        tail = jnp.broadcast_to(
            proposals[:, :, None, 3:5], (B, proposals.shape[1], J, 2))
        fused_out = jnp.concatenate([fused, tail], axis=3)

        return {
            "fused_poses": fused_out,
            "plane_poses": planes,
            "proposals": proposals,
            "mask": mask,
            "hm2d": det["hm2d"],
            "hm1d": det["hm1d"],
            "bbox_flat": det["bbox_flat"],
        }


# ---------------------------------------------------------------------------
# Training losses (faster_voxelpose.py:96-153)
# ---------------------------------------------------------------------------

def compute_losses(cfg: FVPConfig, outputs: dict, targets: dict,
                   meta: dict) -> dict:
    """The four-part loss with the reference's exact masking/normalization.

    targets: 2d_heatmaps (B, X, Y), 1d_heatmaps (B, G, Z), index (B, G),
             bbox (B, G, 2), mask (B, G)
    meta:    joints_3d (B, G, J, 3), joints_3d_vis (B, G, J)
    """
    prop = outputs["proposals"]
    mask = outputs["mask"]                                  # (B, K)
    B, K = mask.shape
    J = cfg.num_joints

    p2g = prop[..., 3]
    p2g_idx = jnp.maximum(p2g, 0.0).astype(jnp.int32)       # (B, K)
    n_matched = jnp.sum(mask)

    # 2D BEV heatmap MSE over every cell
    loss_2d = cfg.lambda_loss_2d * jnp.mean(
        (outputs["hm2d"] - targets["2d_heatmaps"]) ** 2)

    # 1D z-heatmap MSE over matched proposals only
    matched_1d = jnp.take_along_axis(
        targets["1d_heatmaps"], p2g_idx[:, :, None], axis=1)  # (B, K, Z)
    se_1d = (outputs["hm1d"] - matched_1d) ** 2
    denom_1d = jnp.maximum(n_matched * se_1d.shape[2], 1)
    loss_1d = cfg.lambda_loss_1d * jnp.sum(
        se_1d * mask[:, :, None]) / denom_1d

    # bbox L1 at the GT center cells (note: the reference's target mask is
    # `arange <= num_person`, which includes one padding row — preserved)
    gt_index = targets["index"].astype(jnp.int32)           # (B, G)
    pred_bbox = jnp.take_along_axis(
        outputs["bbox_flat"], gt_index[:, :, None], axis=1)  # (B, G, 2)
    tmask = targets["mask"].astype(jnp.float32)
    denom_bb = jnp.maximum(jnp.sum(tmask) * 2, 1)
    loss_bbox = cfg.lambda_loss_bbox * jnp.sum(
        jnp.abs(pred_bbox - targets["bbox"]) * tmask[:, :, None]) / denom_bb

    # joint losses over matched proposals, visibility-weighted
    gt_j = jnp.take_along_axis(
        meta["joints_3d"], p2g_idx[:, :, None, None], axis=1)  # (B, K, J, 3)
    vis = jnp.take_along_axis(
        meta["joints_3d_vis"], p2g_idx[:, :, None], axis=1)[..., None]
    pm = mask[:, :, None, None].astype(jnp.float32)

    def masked_l1(pred, gt, width):
        denom = jnp.maximum(n_matched * J * width, 1)
        return jnp.sum(jnp.abs(pred * vis - gt * vis) * pm) / denom

    planes = outputs["plane_poses"]
    loss_joint = (
        masked_l1(planes[0], gt_j[..., 0:2], 2)
        + masked_l1(planes[1], gt_j[..., ::2], 2)
        + masked_l1(planes[2], gt_j[..., 1:], 2)
        + cfg.lambda_loss_fused
        * masked_l1(outputs["fused_poses"][..., 0:3], gt_j, 3)
    )
    loss_joint = jnp.where(n_matched > 0, loss_joint, 0.0)

    return {
        "2d_heatmaps": loss_2d,
        "1d_heatmaps": loss_1d,
        "bbox": loss_bbox,
        "joint": loss_joint,
        "total": loss_2d + loss_1d + loss_bbox + loss_joint,
    }
