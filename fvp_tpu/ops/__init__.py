from fvp_tpu.ops.sampling import (  # noqa: F401
    bilinear_sample,
    collapse_planes,
    project_whole,
    sample_person_cubes,
    snap_centers,
)
from fvp_tpu.ops.nms import nms_topk_2d  # noqa: F401
from fvp_tpu.ops.softargmax import soft_argmax  # noqa: F401
