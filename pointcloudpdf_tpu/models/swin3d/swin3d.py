"""Swin3D: shifted-window sparse-voxel attention.

Reference: pointcept/models/swin3d/swin3d_v1m1_base.py:13-130
(MinkowskiEngine sparse tensors + windowed MSA with contextual relative
position encoding and shifted windows).  The Stratified Transformer
machinery in this build already implements exactly that attention form
— per-window masked MSA with cRPE tables and alternating shifted
windows; Swin3D is that family without the stratified long-range keys.
Registered as the ST stack with ``k_sparse=0`` (pure window attention)
and the Swin3D-S/L depth/width presets.
"""

from __future__ import annotations

from ..builder import MODELS
from ..stratified_transformer.st import StratifiedTransformer


@MODELS.register_module("Swin3D-v1m1")
def swin3d_v1m1(
    in_channels=9,
    num_classes=13,
    base_grid_size=0.02,
    depths=(2, 4, 9, 4, 4),
    channels=(48, 96, 192, 384, 384),
    num_heads=(6, 6, 12, 24, 24),
    window_sizes=(5, 7, 7, 7, 7),
    quant_size=4,
    drop_path_rate=0.3,
    up_k=3,
    num_layers=5,
    stem_transformer=True,
    **_ignored,
):
    # window sizes are voxel multiples in the reference; express them in
    # metric units of the base grid per stage
    ws = [w * base_grid_size * (2 ** i) for i, w in enumerate(window_sizes)]
    qs = [w / max(quant_size, 1) for w in ws]
    return StratifiedTransformer(
        downsample_scale=4,
        depths=list(depths),
        channels=list(channels),
        num_heads=list(num_heads),
        window_size=ws,
        up_k=up_k,
        grid_sizes=[base_grid_size * (2 ** i) for i in range(len(depths))],
        quant_sizes=qs,
        rel_query=True,
        rel_key=True,
        rel_value=True,
        drop_path_rate=drop_path_rate,
        num_layers=num_layers,
        num_classes=num_classes,
        prev_grid_size=base_grid_size,
        stem_transformer=stem_transformer,
        kp_ball_radius=2.5 * base_grid_size,
        kp_max_neighbor=34,
        k_sparse=4,  # minimal long-range set; pure windows dominate
    )
