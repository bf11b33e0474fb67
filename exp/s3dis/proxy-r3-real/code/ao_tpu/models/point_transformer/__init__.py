from .ptv1 import PointTransformerSeg, PointTransformerCls
