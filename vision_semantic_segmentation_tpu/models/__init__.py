from .layers import ConvBNReLU, DepthwiseSeparableConv, same_padding
from .resnet import ResNetBackbone, build_backbone, __all_backbones__
from .xception import Xception65, XceptionBlock
from .aspp import ASPP
from .decoder import Decoder
from .deeplab import DeepLabV3Plus, deeplab_from_cfg
from .loss import CrossEntropyLoss, cross_entropy_loss
from .metrics import MeanIOU, confusion_matrix_update, miou_from_confusion
from .build import build_model
from .convert import (
    convert_pth_to_npz,
    load_npz,
    load_torch_checkpoint,
    save_npz,
    torch_state_dict_to_flax,
)

__all__ = [
    "ConvBNReLU",
    "DepthwiseSeparableConv",
    "same_padding",
    "ResNetBackbone",
    "build_backbone",
    "__all_backbones__",
    "Xception65",
    "XceptionBlock",
    "ASPP",
    "Decoder",
    "DeepLabV3Plus",
    "deeplab_from_cfg",
    "CrossEntropyLoss",
    "cross_entropy_loss",
    "MeanIOU",
    "confusion_matrix_update",
    "miou_from_confusion",
    "build_model",
    "convert_pth_to_npz",
    "load_npz",
    "load_torch_checkpoint",
    "save_npz",
    "torch_state_dict_to_flax",
]
