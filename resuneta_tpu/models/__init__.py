from .resuneta import ResUnetA
from .unet import UNet
from .variants import ResUnetAV1, ResUnetALegacy
from .resnet50_unet import ResNet50UNet, IdentityBlock

__all__ = ["ResUnetA", "UNet", "ResUnetAV1", "ResUnetALegacy",
           "ResNet50UNet", "IdentityBlock"]
