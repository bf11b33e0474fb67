from .spunet import SpUNet
