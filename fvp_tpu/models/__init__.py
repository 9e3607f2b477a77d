from fvp_tpu.models.cnns import (  # noqa: F401
    C2CNet,
    CenterNet,
    P2PNet,
    WeightNet,
)
from fvp_tpu.models.resnet import PoseResNet, convert_torch_state  # noqa: F401
from fvp_tpu.models.faster_voxelpose import FasterVoxelPose  # noqa: F401
