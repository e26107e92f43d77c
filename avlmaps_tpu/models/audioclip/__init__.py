"""AudioCLIP-style audio encoder (ESResNeXt-FBSP) + joint audio-text model."""

from avlmaps_tpu.models.audioclip.fbsp import (
    frame_signal, fbsp_weights, fbsp_apply, blackmanharris_window,
    scale_signal,
)
from avlmaps_tpu.models.audioclip.esresnet import (
    ESResNeXtFBSP, ESResNeXtConfig, FrozenBatchNorm, adaptive_max_pool,
    Attention2d, Bottleneck,
)
from avlmaps_tpu.models.audioclip.audioclip import (
    AudioClip, AudioClipConfig, AudioClipEncoder,
)

__all__ = [
    "frame_signal", "fbsp_weights", "fbsp_apply", "blackmanharris_window",
    "scale_signal",
    "ESResNeXtFBSP", "ESResNeXtConfig", "FrozenBatchNorm",
    "adaptive_max_pool", "Attention2d", "Bottleneck",
    "AudioClip", "AudioClipConfig", "AudioClipEncoder",
]
