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
clean k-batch average) by default; TRAIN.ACCUMULATION_QUIRK replicates the
reference's accumulate-then-step interleaving EXACTLY instead — the HDN
step at batch i with (i+1) % k == 0 consumes only batches i-k+1..i-1 (the
stepping batch's detection loss is dropped from the window: function.py:79
steps BEFORE the `else` that would accumulate it), windows restart at each
epoch boundary (`accu_loss = 0` at function.py:29), and the step is gated
on the accumulated loss being > 0. Used by the cross-framework lockstep
A/B so the optimizer schedule is experimentally identical across arms.
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
    # ACCUMULATION_QUIRK window state (None when the quirk is off, so the
    # tree structure — and checkpoint layout — is unchanged by default):
    acc_grads: Any = None      # sum of hdn grads / k over the open window
    acc_loss: Any = None       # accumulated detection loss (step gate)
    acc_count: Any = None      # within-epoch batch index (resets per epoch)


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
    if cfg.accumulation_quirk:
        # plain Adam; the k-batch window is managed explicitly in the
        # train step (TrainState.acc_*) to replicate the reference's
        # interleaving exactly
        hdn_tx = optax.adam(_lr_schedule(cfg, cfg.accumulation_steps))
    else:
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
    quirk = cfg.accumulation_quirk
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        hdn_opt=hdn_tx.init(hdn_params),
        jln_opt=jln_tx.init(jln_params),
        step=jnp.zeros((), jnp.int32),
        acc_grads=(jax.tree_util.tree_map(jnp.zeros_like, hdn_params)
                   if quirk else None),
        acc_loss=jnp.zeros((), jnp.float32) if quirk else None,
        acc_count=jnp.zeros((), jnp.int32) if quirk else None,
    )


def reset_accumulation(state: TrainState) -> TrainState:
    """Zero the ACCUMULATION_QUIRK window (reference resets `accu_loss`
    and the batch index at each epoch start, function.py:28-29,37). Call
    between epochs when the quirk is enabled; no-op otherwise."""
    import dataclasses

    if state.acc_count is None:
        return state
    return dataclasses.replace(
        state,
        acc_grads=jax.tree_util.tree_map(jnp.zeros_like, state.acc_grads),
        acc_loss=jnp.zeros_like(state.acc_loss),
        acc_count=jnp.zeros_like(state.acc_count),
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

        if cfg.accumulation_quirk:
            k = cfg.accumulation_steps
            hdn_loss = (losses["2d_heatmaps"] + losses["1d_heatmaps"]
                        + losses["bbox"])
            # reference: step on the accumulated (k-1)-batch window at
            # every k-th batch, DROPPING the current batch's detection
            # loss (function.py:79-85: the `else` accumulate branch does
            # not run on the stepping iteration)
            do_step = ((state.acc_loss > 0)
                       & ((state.acc_count + 1) % k == 0))

            def quirk_step(_):
                updates, opt = hdn_tx.update(state.acc_grads,
                                             state.hdn_opt, hdn_params)
                return (optax.apply_updates(hdn_params, updates), opt,
                        jax.tree_util.tree_map(jnp.zeros_like,
                                               state.acc_grads),
                        jnp.zeros_like(state.acc_loss))

            def quirk_acc(_):
                acc = jax.tree_util.tree_map(
                    lambda a, g: a + g / k, state.acc_grads, hdn_grads)
                return (hdn_params, state.hdn_opt, acc,
                        state.acc_loss + hdn_loss / k)

            new_hdn, hdn_opt, acc_grads, acc_loss = jax.lax.cond(
                do_step, quirk_step, quirk_acc, None)
            acc_count = state.acc_count + 1
        else:
            hdn_updates, hdn_opt = hdn_tx.update(hdn_grads, state.hdn_opt,
                                                 hdn_params)
            new_hdn = optax.apply_updates(hdn_params, hdn_updates)
            acc_grads, acc_loss, acc_count = (
                state.acc_grads, state.acc_loss, state.acc_count)

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
            acc_grads=acc_grads,
            acc_loss=acc_loss,
            acc_count=acc_count,
        )
        return new_state, losses

    return train_step


def make_train_step(cfg: FVPConfig, model: FasterVoxelPose, backbone=None):
    """Single-device jitted train step. The old state buffers are donated —
    params/opt-state updates reuse their memory in place."""
    return jax.jit(make_train_step_fn(cfg, model, backbone),
                   donate_argnums=(0,))
