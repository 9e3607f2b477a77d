"""Sharded train/eval steps: batch data-parallelism + camera-view
parallelism over a ('data', 'view') mesh.

Inputs are annotated with NamedShardings and the step is compiled under the
mesh; XLA GSPMD partitions the per-view backbone/sampling work across the
'view' axis and inserts the ICI collectives for the view-mean reduction
(the psum replacing the reference's in-device mean at project_whole.py:162)
and for any halo exchange of spatially-sharded convolutions.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fvp_tpu.config import FVPConfig
from fvp_tpu.engine.train import make_train_step_fn
from fvp_tpu.models.faster_voxelpose import FasterVoxelPose


def _data_spec_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda _: P("data"), tree)


def shard_batch(mesh: Mesh, batch: Any, spec: Any) -> Any:
    """Device-put a pytree with matching PartitionSpecs."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), batch, spec)


def make_sharded_train_step(cfg: FVPConfig, model: FasterVoxelPose,
                            mesh: Mesh, backbone=None):
    """Jitted train step with (data, view)-sharded batch input (heatmaps, or
    images when a frozen backbone is given) and data-sharded targets/meta;
    state, rig constants and backbone weights replicated."""
    step_fn = make_train_step_fn(cfg, model, backbone)
    repl = NamedSharding(mesh, P())
    in_shard = NamedSharding(mesh, P("data", "view"))
    data_shard = NamedSharding(mesh, P("data"))

    def spec_of(tree, sharding):
        return jax.tree_util.tree_map(lambda _: sharding, tree)

    def compiled(state, batch_input, rc, targets, meta,
                 backbone_vars=None):
        fn = jax.jit(
            step_fn,
            in_shardings=(spec_of(state, repl), in_shard, spec_of(rc, repl),
                          spec_of(targets, data_shard),
                          spec_of(meta, data_shard),
                          spec_of(backbone_vars, repl)),
            out_shardings=(spec_of(state, repl), None),
        )
        return fn(state, batch_input, rc, targets, meta, backbone_vars)

    return compiled


def make_sharded_eval_step(cfg: FVPConfig, model: FasterVoxelPose,
                           mesh: Mesh, backbone=None, backbone_vars=None):
    # latency-mode tail sharding: split the JLN per-person stacks over all
    # mesh devices (see FasterVoxelPose.jln_mesh) — pure view sharding
    # leaves the whole post-psum tail replicated (Amdahl,
    # docs/MULTIHOST_MODEL.md §3/§4)
    model = model.clone(jln_mesh=mesh)
    repl = NamedSharding(mesh, P())
    in_shard = NamedSharding(mesh, P("data", "view"))

    def fwd(variables, batch_input, rc):
        if backbone is not None:
            B, V = batch_input.shape[:2]
            flat = batch_input.reshape(B * V, *batch_input.shape[2:])
            hm = backbone.apply(backbone_vars, flat, train=False)
            heatmaps = hm.reshape(B, V, *hm.shape[1:]).transpose(
                0, 1, 4, 2, 3)
        else:
            heatmaps = batch_input
        return model.apply(variables, heatmaps, rc, train=False)[
            "fused_poses"]

    def spec_of(tree, sharding):
        return jax.tree_util.tree_map(lambda _: sharding, tree)

    def compiled(variables, batch_input, rc):
        fn = jax.jit(
            fwd,
            in_shardings=(spec_of(variables, repl), in_shard,
                          spec_of(rc, repl)),
            out_shardings=NamedSharding(mesh, P("data")),
        )
        return fn(variables, batch_input, rc)

    return compiled


def make_global(tree: Any, mesh: Mesh, spec_tree: Any) -> Any:
    """Host-local full-value arrays -> global jax.Arrays on `mesh`.

    Multi-process ingestion: each process holds the full logical value
    (identical across processes — deterministic init or shared seed) and
    contributes only the shards its local devices own
    (jax.make_array_from_callback). Works unchanged in single-process
    mode, where it is equivalent to a sharded device_put."""
    import numpy as np

    def put(x, spec):
        s = NamedSharding(mesh, spec)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree, spec_tree)
