from avlmaps_tpu.models.superglue.model import (
    SuperGlueConfig, SuperGlueNet, SuperGlueMatcher,
    log_optimal_transport, match_from_assignment, normalize_keypoints,
)
from avlmaps_tpu.models.superglue.port import (
    config_from_state_dict, load_superglue_checkpoint,
    port_superglue_state_dict,
)

__all__ = [
    "SuperGlueConfig", "SuperGlueNet", "SuperGlueMatcher",
    "log_optimal_transport", "match_from_assignment", "normalize_keypoints",
    "config_from_state_dict", "load_superglue_checkpoint",
    "port_superglue_state_dict",
]
