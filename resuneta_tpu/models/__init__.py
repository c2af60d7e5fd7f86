from .resuneta import ResUnetA
from .unet import UNet

__all__ = ["ResUnetA", "UNet"]
