from .ptv2 import PointTransformerV2
