from .modules import (
    PointTransformerLayer,
    TransitionDown,
    TransitionUp,
    Bottleneck,
)
from .point_transformer_seg import (
    PointTransformerSeg,
    point_transformer_seg26,
    point_transformer_seg38,
    point_transformer_seg50,
)
from .point_transformer_cls import (
    PointTransformerCls,
    point_transformer_cls26,
    point_transformer_cls38,
    point_transformer_cls50,
)
from .point_transformer_partseg import (
    PointTransformerPartSeg,
    pt_partseg26,
    pt_partseg38,
    pt_partseg50,
)
