"""CLIP text/image encoders (flax), tokenizer, and feature APIs."""

from avlmaps_tpu.models.clip.model import (
    Clip, ClipConfig, CLIP_VARIANTS, CLIP_FEAT_DIMS, TextEncoder,
    VisionTransformer, quick_gelu, preprocess_images,
)
from avlmaps_tpu.models.clip.tokenizer import (
    ClipTokenizer, tokenize, default_tokenizer, VOCAB_SIZE, CONTEXT_LENGTH,
)
from avlmaps_tpu.models.clip.features import (
    ClipEncoder, MULTIPLE_TEMPLATES,
)

__all__ = [
    "Clip", "ClipConfig", "CLIP_VARIANTS", "CLIP_FEAT_DIMS", "TextEncoder",
    "VisionTransformer", "quick_gelu", "preprocess_images",
    "ClipTokenizer", "tokenize", "default_tokenizer", "VOCAB_SIZE",
    "CONTEXT_LENGTH", "ClipEncoder", "MULTIPLE_TEMPLATES",
]
