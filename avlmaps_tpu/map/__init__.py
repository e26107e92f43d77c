"""Map artifacts, builders, and query classes."""

from avlmaps_tpu.map.voxel_map import (
    SparseVoxelMap,
    save_3d_map,
    load_3d_map,
    save_clip_sparse_map,
    load_clip_sparse_map,
)
from avlmaps_tpu.map.map_base import Map
from avlmaps_tpu.map.vlmap import VLMap
from avlmaps_tpu.map.vlmap_builder import VLMapBuilder
from avlmaps_tpu.map.sound_map import SoundMap
from avlmaps_tpu.map.area_map import AreaMap
from avlmaps_tpu.map.visual_map import VisualMap
from avlmaps_tpu.map.avlmap import AVLMap
from avlmaps_tpu.map.vlmap_builder_multi_floor import (
    VLMapBuilderMultiFloor, VLMapMultiFloor,
)

__all__ = [
    "SparseVoxelMap", "save_3d_map", "load_3d_map",
    "save_clip_sparse_map", "load_clip_sparse_map",
    "Map", "VLMap", "VLMapBuilder", "SoundMap", "AreaMap", "VisualMap",
    "AVLMap", "VLMapBuilderMultiFloor", "VLMapMultiFloor",
]
