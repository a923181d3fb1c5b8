"""OctFormer: octree attention as serialized patch attention.

Reference: pointcept/models/octformer/octformer_v1m1_base.py:507-629
(ocnn octrees + dilated octree windows).  An octree traversal IS a
z-order (Morton) serialization of the voxel grid — OctFormer's window
attention over contiguous octree nodes is exactly patch attention over
the z-order curve, and its dilated windows interleave patches at a
stride.  The TPU build therefore realises OctFormer on the serialized
patch-attention machinery (models/point_transformer_v3/ptv3.py) with
z-order-only serialization, matching depths/channels/heads/patch sizes
of the reference config family; the octree-specific dilation schedule is
approximated by the alternating serialization orders.
"""

from __future__ import annotations

from ..builder import MODELS
from ..point_transformer_v3.ptv3 import PointTransformerV3


@MODELS.register_module("OctFormer-v1m1")
def octformer_v1m1(
    in_channels=10,
    num_classes=0,
    channels=(96, 192, 384, 384),
    num_blocks=(2, 3, 18, 2),
    num_heads=(6, 12, 24, 24),
    patch_size=26,
    stem_down=2,
    **_ignored,
):
    depths = tuple(num_blocks) + (2,)
    chans = tuple(channels) + (channels[-1],)
    heads = tuple(num_heads) + (num_heads[-1],)
    return PointTransformerV3(
        in_channels=in_channels,
        order=("z", "z-trans"),
        stride=(2,) * (len(depths) - 1),
        enc_depths=depths,
        enc_channels=chans,
        enc_num_head=heads,
        enc_patch_size=(patch_size,) * len(depths),
        dec_depths=(2,) * (len(depths) - 1),
        dec_channels=chans[:-1],
        dec_num_head=heads[:-1],
        dec_patch_size=(patch_size,) * (len(depths) - 1),
        drop_path=0.5,
    )
