from posecnn_tpu.models.vgg16 import VGG16Trunk
from posecnn_tpu.models.posecnn import PoseCNN, PoseCNNOutputs

__all__ = ["VGG16Trunk", "PoseCNN", "PoseCNNOutputs"]
