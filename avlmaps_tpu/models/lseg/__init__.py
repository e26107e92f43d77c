"""LSeg dense pixel-embedding model (ViT-L/16 + DPT decoder)."""

from avlmaps_tpu.models.lseg.model import (
    LSegNet, LSegConfig, init_lseg, LOGIT_SCALE,
)
from avlmaps_tpu.models.lseg.vit import DenseViT, DenseViTConfig
from avlmaps_tpu.models.lseg.dpt import DPTDecoder
from avlmaps_tpu.models.lseg.window import (
    sliding_window_features, features_at_points, plan_windows,
    multi_scale_features,
    normalize_image, NORM_MEAN, NORM_STD,
)
from avlmaps_tpu.models.lseg.port import (
    port_lseg_state_dict, load_lseg_checkpoint, strip_net_prefix,
)

__all__ = [
    "LSegNet", "LSegConfig", "init_lseg", "LOGIT_SCALE",
    "DenseViT", "DenseViTConfig", "DPTDecoder",
    "sliding_window_features", "features_at_points", "plan_windows",
    "multi_scale_features",
    "normalize_image", "NORM_MEAN", "NORM_STD",
    "port_lseg_state_dict", "load_lseg_checkpoint", "strip_net_prefix",
]
