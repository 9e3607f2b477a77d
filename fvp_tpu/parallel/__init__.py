from fvp_tpu.parallel.mesh import make_mesh, pick_mesh_shape  # noqa: F401
from fvp_tpu.parallel.sharding import (  # noqa: F401
    make_sharded_eval_step,
    make_sharded_train_step,
    shard_batch,
)
