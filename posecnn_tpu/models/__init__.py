from posecnn_tpu.models.vgg16 import VGG16Trunk, bilinear_upsample
from posecnn_tpu.models.posecnn import PoseCNN, PoseCNNOutputs
from posecnn_tpu.models.detection import PoseCNNDet, detection_losses
from posecnn_tpu.models.recurrent import (
    FUSION_CELLS,
    Add2DCell,
    FusionCell,
    GRU3DCell,
    GRUOriginalCell,
    RecurrentSegNet,
    Vanilla2DCell,
    VideoState,
)
from posecnn_tpu.models.resnet50 import ResNet50Seg, ResNet50Trunk
from posecnn_tpu.models.fcn8 import FCN8
from posecnn_tpu.models.gan import (
    DCGANDiscriminator,
    DCGANGenerator,
    FeatureDiscriminator,
    gan_losses,
)
from posecnn_tpu.core.registry import MODELS

MODELS.register("posecnn", PoseCNN)
MODELS.register("posecnn_det", PoseCNNDet)
MODELS.register("recurrent_seg", RecurrentSegNet)
MODELS.register("resnet50_seg", ResNet50Seg)
MODELS.register("fcn8", FCN8)

__all__ = [
    "VGG16Trunk",
    "bilinear_upsample",
    "PoseCNN",
    "PoseCNNOutputs",
    "PoseCNNDet",
    "detection_losses",
    "RecurrentSegNet",
    "VideoState",
    "FUSION_CELLS",
    "FusionCell",
    "GRUOriginalCell",
    "Vanilla2DCell",
    "Add2DCell",
    "GRU3DCell",
    "ResNet50Seg",
    "ResNet50Trunk",
    "FCN8",
    "DCGANGenerator",
    "DCGANDiscriminator",
    "FeatureDiscriminator",
    "gan_losses",
    "MODELS",
]
