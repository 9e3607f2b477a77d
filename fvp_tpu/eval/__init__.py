from fvp_tpu.eval.ap import evaluate_ap_mpjpe  # noqa: F401
from fvp_tpu.eval.pcp import coco2campus3d, coco2shelf3d, evaluate_pcp  # noqa: F401
