"""fvp_tpu — a TPU-native multi-view 3D human pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the Faster-VoxelPose pipeline
(multi-view 2D heatmaps -> voxel aggregation -> human detection -> per-person
joint localization), built for TPU hardware: fully batched fixed-shape
computation under a single `jax.jit`, camera geometry folded into precomputed
device-resident constants, sharding over a `jax.sharding.Mesh` for camera-view
and data parallelism.

Behavioral reference: ME495/Faster-VoxelPose (ECCV'22), studied structurally
(see SURVEY.md); this is a new TPU-first implementation, not a port.
"""

__version__ = "0.1.0"

from fvp_tpu.config import FVPConfig, load_config  # noqa: F401
