from s4former_tpu.models.backbones.vit import VisionTransformer  # noqa: F401
from s4former_tpu.models.backbones.mit import MixVisionTransformer  # noqa: F401
from s4former_tpu.models.backbones.resnet import ResNet, ResNetV1c  # noqa: F401
from s4former_tpu.models.backbones.swin import SwinTransformer  # noqa: F401
from s4former_tpu.models.backbones.beit import BEiT, MAE  # noqa: F401
from s4former_tpu.models.backbones.mobilenet import MobileNetV2, MobileNetV3  # noqa: F401
from s4former_tpu.models.backbones.unet import UNet  # noqa: F401
from s4former_tpu.models.backbones.hrnet import HRNet  # noqa: F401
from s4former_tpu.models.backbones.cnn_zoo import (  # noqa: F401
    BiSeNetV1, BiSeNetV2, CGNet, ERFNet, FastSCNN, ICNet, ResNeSt, ResNeXt,
    STDCContextPathNet, STDCNet, TIMMBackbone)
from s4former_tpu.models.backbones.twins import PCPVT, SVT  # noqa: F401
