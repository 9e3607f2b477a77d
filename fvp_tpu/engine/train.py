"""Training: dual-optimizer schedule as one jitted step.

Behavioral reference: /root/reference/lib/core/function.py:15-123 and
run/train.py:39-54 — two Adam optimizers over disjoint parameter sets:
  * JLN params (P2PNet + WeightNet): stepped every batch on the joint loss,
    skipped entirely when there are no matched proposals (function.py:74-77);
  * HDN params (CenterNet + C2CNet): detection losses (2d+1d+bbox)
    gradient-accumulated over `accumulation_steps` batches (function.py:79-85).

Because the reference detaches proposals before the JLN
(faster_voxelpose.py:93), the joint loss has zero gradient w.r.t. HDN params
and vice versa — so ONE backward pass of the summed loss yields both
optimizers' gradients exactly. The accumulation uses optax.MultiSteps (a
clean k-batch average; the reference's accumulate-then-step interleaving
drops every 4th batch from the window — a quirk not worth preserving).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax

from fvp_tpu.config import FVPConfig
from fvp_tpu.models.faster_voxelpose import FasterVoxelPose, compute_losses

HDN_MODULES = ("center_net", "c2c_net")
JLN_MODULES = ("p2p_net", "weight_net")


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    batch_stats: Any
    hdn_opt: Any
    jln_opt: Any
    step: Any


def _split(params):
    hdn = {k: v for k, v in params.items() if k in HDN_MODULES}
    jln = {k: v for k, v in params.items() if k in JLN_MODULES}
    return hdn, jln


def _merge(hdn, jln):
    return {**hdn, **jln}


def _lr_schedule(cfg: FVPConfig, per_k: int = 1):
    """Constant LR (the reference trains fixed Adam 1e-4,
    run/train.py:50-52); optional step decay via TRAIN.LR_DECAY_EPOCHS /
    LR_DECAY_FACTOR — an extension the reference lacks, off by default.
    `per_k`: optimizer updates per epoch are steps/k for MultiSteps."""
    if not cfg.lr_decay_epochs:
        return cfg.lr
    spe = max(cfg.steps_per_epoch, 1)
    bounds = {max(int(e) * spe // per_k, 1): cfg.lr_decay_factor
              for e in cfg.lr_decay_epochs}
    return optax.piecewise_constant_schedule(cfg.lr, bounds)


def make_optimizers(cfg: FVPConfig):
    hdn_tx = optax.MultiSteps(
        optax.adam(_lr_schedule(cfg, cfg.accumulation_steps)),
        every_k_schedule=cfg.accumulation_steps)
    jln_tx = optax.adam(_lr_schedule(cfg))
    return hdn_tx, jln_tx


def create_train_state(cfg: FVPConfig, model: FasterVoxelPose, rc,
                       sample_heatmaps, rng_key) -> TrainState:
    # jit the init: eager per-op dispatch is minutes-slow on remote runtimes
    variables = jax.jit(
        lambda k, h: model.init(k, h, rc, train=False)
    )(rng_key, sample_heatmaps)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    hdn_tx, jln_tx = make_optimizers(cfg)
    hdn_params, jln_params = _split(params)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        hdn_opt=hdn_tx.init(hdn_params),
        jln_opt=jln_tx.init(jln_params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step_fn(cfg: FVPConfig, model: FasterVoxelPose,
                       backbone=None):
    """The un-jitted train step (state, batch_input, rc, targets, meta
    [, backbone_vars]) -> (new_state, losses); wrap with jax.jit (single
    device) or with mesh shardings (fvp_tpu.parallel.sharding).

    With `backbone`, batch_input is images (B, V, H, W, 3) run through the
    FROZEN backbone inside the step — eval-mode BN, gradients cut — matching
    the reference's image-source training (run/train.py:41-43 freezes the
    backbone; lib/core/function.py:38-51 / faster_voxelpose.py:75 run it
    per view in the train forward). Otherwise batch_input is precomputed
    heatmaps (B, V, J, h, w)."""
    hdn_tx, jln_tx = make_optimizers(cfg)

    def loss_fn(params, batch_stats, batch_input, rc, targets, meta,
                backbone_vars):
        if backbone is not None:
            B, V = batch_input.shape[:2]
            flat = batch_input.reshape(B * V, *batch_input.shape[2:])
            hm = backbone.apply(backbone_vars, flat, train=False)
            # (B*V, h, w, J) -> (B, V, J, h, w); frozen: cut the backward
            heatmaps = jax.lax.stop_gradient(
                hm.reshape(B, V, *hm.shape[1:]).transpose(0, 1, 4, 2, 3))
        elif isinstance(batch_input, dict):
            # render-params payload: splat the input gaussians on device
            # (ops/heatmap_render.py) instead of hauling 59 MB of rendered
            # heatmaps over the host link
            from fvp_tpu.ops.heatmap_render import render_heatmaps_device
            rp = batch_input
            heatmaps = render_heatmaps_device(
                cfg, rp["mu"], rp["vis"], rp["sigma"], rp["scale"],
                rp["occ"])
        else:
            heatmaps = batch_input
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            heatmaps, rc, train=True, meta=meta,
            mutable=["batch_stats"])
        losses = compute_losses(cfg, outputs, targets, meta)
        # one backward: HDN losses and the joint loss reach disjoint params
        hdn_total = (losses["2d_heatmaps"] + losses["1d_heatmaps"]
                     + losses["bbox"])
        return hdn_total + losses["joint"], (losses,
                                             mutated["batch_stats"])

    def train_step(state: TrainState, batch_input, rc, targets, meta,
                   backbone_vars=None):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch_input, rc, targets,
            meta, backbone_vars)

        hdn_grads, jln_grads = _split(grads)
        hdn_params, jln_params = _split(state.params)

        hdn_updates, hdn_opt = hdn_tx.update(hdn_grads, state.hdn_opt,
                                             hdn_params)
        new_hdn = optax.apply_updates(hdn_params, hdn_updates)

        def do_jln(_):
            updates, opt = jln_tx.update(jln_grads, state.jln_opt,
                                         jln_params)
            return optax.apply_updates(jln_params, updates), opt

        def skip_jln(_):
            return jln_params, state.jln_opt

        # reference skips the JLN step when no proposal matched a GT
        new_jln, jln_opt = jax.lax.cond(
            losses["joint"] > 0, do_jln, skip_jln, None)

        new_state = TrainState(
            params=_merge(new_hdn, new_jln),
            batch_stats=new_stats,
            hdn_opt=hdn_opt,
            jln_opt=jln_opt,
            step=state.step + 1,
        )
        return new_state, losses

    return train_step


def make_train_step(cfg: FVPConfig, model: FasterVoxelPose, backbone=None):
    """Single-device jitted train step. The old state buffers are donated —
    params/opt-state updates reuse their memory in place."""
    return jax.jit(make_train_step_fn(cfg, model, backbone),
                   donate_argnums=(0,))
