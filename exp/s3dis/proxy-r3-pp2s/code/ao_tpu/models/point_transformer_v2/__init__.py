from .ptv2m2 import PointTransformerV2
