"""Serving weight packing: compute the Pallas kernels' packed weight
tensors ONCE at model load and attach them as a 'packed' flax variable
collection, instead of re-deriving them inside every jitted forward.

Round-3 A/Bs showed the fused C2C/P2P kernels losing to XLA purely on
their per-call packing cost (~40 tiny XLA ops per net per step —
docs/PERFORMANCE.md); for param-frozen serving that work is loop-invariant.
The model call sites (models/faster_voxelpose.py detect/localize,
models/cnns.py WeightNet, models/resnet.py head='pallas') read the
collection when present and fall back to in-call packing otherwise, so
training and ad-hoc applies are unaffected and checkpoints never contain
packed tensors (they are derived state, recomputed on load).
"""

from __future__ import annotations

import jax

from fvp_tpu.config import FVPConfig


def pack_model_variables(cfg: FVPConfig, variables) -> dict:
    """Return `variables` plus a 'packed' collection for the HDN+JLN model
    (CenterNet / C2CNet / P2PNet bodies+heads, WeightNet grouped-conv
    front). Cheap (<1 ms of XLA on-device work, a few MB)."""
    from fvp_tpu.ops.pallas.deconv_head import bn_affine
    from fvp_tpu.ops.pallas.hourglass import (
        pack_c2cnet, pack_centernet, pack_p2pnet,
    )
    from fvp_tpu.ops.pallas.weightnet import pack_weightnet_pool

    @jax.jit
    def build(variables):
        params, stats = variables["params"], variables["batch_stats"]

        def sub(name):
            return {"params": params[name], "batch_stats": stats[name]}

        wn_p, wn_s = params["weight_net"], stats["weight_net"]
        aff = bn_affine(wn_p["BatchNorm_0"]["scale"],
                        wn_p["BatchNorm_0"]["bias"],
                        wn_s["BatchNorm_0"]["mean"],
                        wn_s["BatchNorm_0"]["var"])
        return {
            "center_net": {"fused": pack_centernet(sub("center_net"))},
            "c2c_net": {"fused": pack_c2cnet(sub("c2c_net"))},
            "p2p_net": {"fused": pack_p2pnet(sub("p2p_net"))},
            "weight_net": {"fused": pack_weightnet_pool(
                wn_p["Conv_0"]["kernel"], wn_p["Conv_0"]["bias"], aff,
                cfg.num_joints)},
        }

    out = dict(variables)
    out["packed"] = build(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]})
    return out


def pack_backbone_variables(variables) -> dict:
    """Return backbone `variables` plus the pre-packed Pallas deconv-head
    weights (head='pallas'; ~25 MB of per-(tap, parity) transposes hoisted
    to load — models/resnet.py:389)."""
    from fvp_tpu.ops.pallas.deconv_head import pack_deconv_head

    params = variables["params"]
    if "deconv0" not in params:
        return dict(variables)
    kernels = [params[f"deconv{i}"]["kernel"] for i in range(3)]
    out = dict(variables)
    out["packed"] = {"head_fused": jax.jit(pack_deconv_head)(kernels)}
    return out
