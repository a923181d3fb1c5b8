from .geometry import (
    knn,
    ball_query,
    grouping,
    interpolation,
    knn_batched,
    ball_query_batched,
    grouping_batched,
    interpolation_batched,
)
from .sampling import (
    farthest_point_sampling,
    blocked_farthest_point_sampling,
    downsample_count,
)
from .serialization import morton_encode, morton_sort_indices, grid_coord_from_points
from .bucket import (
    pad_to_bucket,
    pack_padded,
    counts_from_arrays,
    mask_from_count,
    offsets_from_count,
    unpack_padded,
    flatten_valid,
)
