from .swin3d import swin3d_v1m1
