from fvp_tpu.geometry.cameras import (  # noqa: F401
    CameraRig,
    project_points,
    project_points_np,
)
from fvp_tpu.geometry.transforms import (  # noqa: F401
    affine_apply,
    get_affine_transform,
    get_resize_transform,
    get_scale,
    rotate_points,
)
from fvp_tpu.geometry.grids import (  # noqa: F401
    RigConstants,
    build_rig_constants,
    center_grids,
    voxel_grid,
)
