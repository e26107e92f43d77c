"""TPU compute kernels and device-side ops."""

from avlmaps_tpu.ops.voxel_fusion import (
    VoxelFusionState,
    init_fusion_state,
    fuse_points,
    export_fusion_state,
    concept_fusion_alpha,
)
from avlmaps_tpu.ops.similarity import (
    score_argmax,
    score_features,
    score_features_hbm,
    topk_categories,
)
from avlmaps_tpu.ops.heatmap import (
    heatmap_from_mask_3d,
    heatmap_from_mask_2d,
    distance_transform_edt_jax,
    radial_decay_heatmap,
)
from avlmaps_tpu.ops.pooling import (
    pool_3d_label_to_2d,
    pool_3d_value_to_2d_max,
    pool_3d_rgb_to_2d,
    lift_2d_to_3d,
)
from avlmaps_tpu.ops.morphology import (
    binary_dilation_jax,
    binary_erosion_jax,
    binary_closing_jax,
    gaussian_blur_jax,
)

__all__ = [
    "VoxelFusionState", "init_fusion_state", "fuse_points",
    "export_fusion_state", "concept_fusion_alpha",
    "score_argmax", "score_features", "score_features_hbm",
    "topk_categories",
    "heatmap_from_mask_3d", "heatmap_from_mask_2d",
    "distance_transform_edt_jax", "radial_decay_heatmap",
    "pool_3d_label_to_2d", "pool_3d_value_to_2d_max", "pool_3d_rgb_to_2d",
    "lift_2d_to_3d",
    "binary_dilation_jax", "binary_erosion_jax", "binary_closing_jax",
    "gaussian_blur_jax",
]
