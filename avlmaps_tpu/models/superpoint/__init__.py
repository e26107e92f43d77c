from avlmaps_tpu.models.superpoint.model import (
    SuperPointConfig, SuperPointNet, SuperPointExtractor,
    select_keypoints, sample_descriptors, mutual_nearest_matches,
)
from avlmaps_tpu.models.superpoint.port import (
    port_superpoint_state_dict, load_superpoint_checkpoint,
)

__all__ = [
    "SuperPointConfig", "SuperPointNet", "SuperPointExtractor",
    "select_keypoints", "sample_descriptors", "mutual_nearest_matches",
    "port_superpoint_state_dict", "load_superpoint_checkpoint",
]
