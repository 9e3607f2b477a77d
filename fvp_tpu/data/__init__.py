from fvp_tpu.data.targets import generate_target  # noqa: F401
from fvp_tpu.data.heatmaps import (  # noqa: F401
    compute_human_scale,
    generate_input_heatmap,
)
