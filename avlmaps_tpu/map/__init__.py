"""Map artifacts, builders, and query classes."""

from avlmaps_tpu.map.voxel_map import (
    SparseVoxelMap,
    save_3d_map,
    load_3d_map,
    save_clip_sparse_map,
    load_clip_sparse_map,
)

__all__ = [
    "SparseVoxelMap",
    "save_3d_map",
    "load_3d_map",
    "save_clip_sparse_map",
    "load_clip_sparse_map",
]
