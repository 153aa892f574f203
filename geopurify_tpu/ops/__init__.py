"""Irregular compute primitives, TPU-first.

Everything here obeys the static-shape contract: device functions take padded
arrays plus validity masks/counts, never data-dependent shapes. Host helpers
(numpy) mirror the device semantics and are used by the data pipeline and as
test oracles.
"""

from geopurify_tpu.ops.voxelize import (  # noqa: F401
    fnv_hash_vec,
    ravel_hash_vec,
    sparse_quantize_np,
    voxelize_points,
    Voxelizer,
)
from geopurify_tpu.ops.segment import segment_mean, segment_sum  # noqa: F401
from geopurify_tpu.ops.projection import compute_point_image_mapping  # noqa: F401
from geopurify_tpu.ops.knn import knn_search, nearest_fill  # noqa: F401
