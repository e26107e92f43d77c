"""avlmaps_tpu — a TPU-native multimodal open-vocabulary 3D mapping framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of AVLMaps
(avlmaps/AVLMaps): dense visual-language pixel features (LSeg-style ViT + DPT),
audio embeddings in CLIP space (AudioCLIP-style ESResNeXt-FBSP), CLIP text/image
encoders, a sparse 3D voxel feature map built by a scatter-accumulate fusion
kernel, open-vocabulary heatmap indexing, and a host-side navigation stack.

Layering (mirrors reference SURVEY.md §1):
  geometry/   pure-function pose/projection/grid math (host numpy + device jax)
  ops/        TPU compute kernels (voxel fusion, similarity, heatmaps, morphology)
  models/     flax encoders (CLIP text/image, LSeg dense ViT, AudioCLIP audio)
  map/        map artifacts + builders + query classes (VLMap/Sound/Area/Visual/AVL)
  parallel/   device-mesh sharding for multi-chip map building
  pipeline/   host-side double-buffered frame loader
  nav/        visibility-graph planner + discrete controller (host-side)
  robot/      language robot primitives + simulator binding
  dataloader/ pose bridges between simulator, map and cropped-map frames
  task/       navigation task loading + replay evaluation
"""

__version__ = "0.1.0"

from avlmaps_tpu.config import (
    AVLMapsConfig,
    MapConfig,
    PoseInfo,
    load_config,
)

__all__ = [
    "AVLMapsConfig",
    "MapConfig",
    "PoseInfo",
    "load_config",
    "__version__",
]
