from .spconv_unet import SpUNet
