"""Voxel-block spatial sharding: the whole-space BEV map split across
devices along the x (row-block) axis, with explicit halo exchange at block
seams for windowed ops.

This is the framework's context-parallel axis (SURVEY.md §5): the
reference's "sequence length" analog is the voxel-grid extent, and scaling
it across chips needs the 3x3 NMS window (reference lib/core/proposal.py:49)
and CenterNet's front 7x7 conv to see (kernel-1)/2 rows across each seam.

Two complementary mechanisms:

* Convolutions (CenterNet over the BEV map): GSPMD. Annotate the BEV input
  with PartitionSpec(None, 'space', None, None) and jit under the mesh —
  XLA partitions the convs and inserts the halo collectives itself. This is
  the idiomatic TPU path; `spatially_sharded_conv_equivalence` in
  tests/test_spatial.py pins the numerics to the unsharded run.

* NMS + top-K (data-dependent, window + global selection): explicit
  shard_map. Each device holds a (B, X/n, Y) row block; 1-cell halos move
  over ICI via `jax.lax.ppermute`, the 3x3 max window runs locally, local
  per-block top-K candidates are `all_gather`ed and merged into the global
  top-K. A peak centered on a seam survives on exactly one block (its own),
  because both neighbors see it through the halo and suppress theirs.

Outer-boundary halos are -inf, matching the single-device
`jax.lax.reduce_window` init value — zeros would change results for
negative map values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def make_spatial_mesh(n_blocks: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_blocks
    import numpy as np
    return Mesh(np.asarray(devices[:n_blocks]), axis_names=("space",))


def make_pipeline_mesh(n_data: int, n_space: int, devices=None) -> Mesh:
    """('data', 'space') mesh for the spatially-sharded eval pipeline:
    batch over 'data', whole-space voxel x-rows over 'space'."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_space, (len(devices), n_data, n_space)
    import numpy as np
    return Mesh(
        np.asarray(devices[:n_data * n_space]).reshape(n_data, n_space),
        axis_names=("data", "space"))


def spatial_size(mesh) -> int:
    """Number of voxel-row blocks ('space' axis extent; 1 = not sharded)."""
    if mesh is None or "space" not in mesh.axis_names:
        return 1
    return mesh.shape["space"]


def sharded_nms_topk_2d(mesh: Mesh, hm: jax.Array, max_num: int,
                        kernel: int = 3):
    """Spatially-sharded equivalent of ops.nms.nms_topk_2d over a batch.

    hm: (B, X, Y) BEV heatmaps, X divisible by the mesh's 'space' size.
    Returns (vals (B, K), xy (B, K, 2) int32, flat (B, K)) — replicated
    across 'space', bitwise equal to the single-device op (including tie
    order: the merged candidate list is shard-major, i.e. flat-index-major
    for equal values, matching jax.lax.top_k's lower-index-first
    tie-breaking).

    Composable under an outer jit: only the 'space' axis is manual
    (shard_map axis_names); other mesh axes (e.g. 'data') stay under GSPMD,
    so this runs inside a spatially-sharded model forward unchanged."""
    n = mesh.shape["space"]
    B, X, Y = hm.shape
    assert X % n == 0, (X, n)
    XL = X // n
    halo = (kernel - 1) // 2
    assert halo <= XL, "block height must cover the window halo"
    neg = jnp.array(-jnp.inf, hm.dtype)

    def block_fn(blk):                                    # blk: (B, XL, Y)
        idx = jax.lax.axis_index("space")
        # halo exchange over ICI: my last rows -> next block's top halo,
        # my first rows -> previous block's bottom halo
        top = jax.lax.ppermute(blk[:, XL - halo:, :], "space",
                               [(i, i + 1) for i in range(n - 1)])
        bot = jax.lax.ppermute(blk[:, :halo, :], "space",
                               [(i + 1, i) for i in range(n - 1)])
        top = jnp.where(idx == 0, neg, top)        # outer boundary: -inf
        bot = jnp.where(idx == n - 1, neg, bot)
        padded = jnp.concatenate([top, blk, bot], axis=1)

        local_max = jax.lax.reduce_window(
            padded, float("-inf"), jax.lax.max,
            window_dimensions=(1, kernel, kernel),
            window_strides=(1, 1, 1),
            padding=((0, 0), (0, 0), (halo, halo)),
        )                                                 # (B, XL, Y)
        keep = jnp.where(blk == local_max, blk, jnp.zeros_like(blk))

        vals, lflat = jax.lax.top_k(keep.reshape(B, XL * Y), max_num)
        gx = lflat // Y + idx * XL
        gflat = gx * Y + lflat % Y

        all_vals = jax.lax.all_gather(vals, "space")      # (n, B, K)
        all_flat = jax.lax.all_gather(gflat, "space")
        av = all_vals.transpose(1, 0, 2).reshape(B, n * max_num)
        af = all_flat.transpose(1, 0, 2).reshape(B, n * max_num)
        v, sel = jax.lax.top_k(av, max_num)
        flat = jnp.take_along_axis(af, sel, axis=1)
        xy = jnp.stack([flat // Y, flat % Y], axis=2).astype(jnp.int32)
        return v, xy, flat

    fn = shard_map(block_fn, mesh=mesh,
                   in_specs=P(None, "space", None),
                   out_specs=(P(), P(), P()),
                   axis_names=frozenset({"space"}),
                   check_vma=False)
    return fn(hm)


def spatial_sharding_constraint(x: jax.Array, mesh: Mesh,
                                axis: int = 1) -> jax.Array:
    """Annotate a BEV-like array so GSPMD splits the given spatial axis over
    the 'space' mesh axis (halo exchange for convs is then XLA's job)."""
    spec = [None] * x.ndim
    spec[axis] = "space"
    return jax.lax.with_sharding_constraint(
        x, jax.sharding.NamedSharding(mesh, P(*spec)))


def make_spatial_eval_step(cfg, model, mesh: Mesh):
    """Jitted eval forward over a ('data', 'space') pipeline mesh.

    The batch is sharded over 'data'; inside the model (which must carry
    `spatial_mesh=mesh`) the whole-space volume and BEV maps are sharded
    over 'space' (GSPMD partitions the sampler gathers and CenterNet convs,
    inserting the seam halos itself) and NMS+top-K runs through the
    explicit ppermute-halo shard_map above. Heatmaps and rig constants are
    replicated across 'space' — the per-view heatmaps are small
    (V·J·h·w ≈ 7 MB fp32 at flagship shapes) while the volume they expand
    into is the thing that outgrows a chip (X·Y·Z·J), which is exactly the
    axis this shards.
    """
    from jax.sharding import NamedSharding

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def fwd(variables, heatmaps, rc):
        return model.apply(variables, heatmaps, rc, train=False)[
            "fused_poses"]

    def spec_of(tree, s):
        return jax.tree_util.tree_map(lambda _: s, tree)

    def compiled(variables, heatmaps, rc):
        fn = jax.jit(fwd, in_shardings=(spec_of(variables, repl), data,
                                        spec_of(rc, repl)),
                     out_shardings=data)
        return fn(variables, heatmaps, rc)

    return compiled
