"""CLIP text + vision encoders in flax.

Architecture-faithful to OpenAI CLIP (the reference consumes it via the pip
``clip`` package and a bundled copy, avlmaps/audioclip/model/clip/model.py),
re-implemented TPU-first: fused QKV projections, bf16-friendly compute dtype
with f32 layernorms/softmax accumulation, static shapes throughout so the
whole encoder jits to a single XLA program.

Weight porting from OpenAI checkpoints is in ``port.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from avlmaps_tpu.models.clip.tokenizer import VOCAB_SIZE, CONTEXT_LENGTH


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    embed_dim: int = 512
    # vision
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    # text
    vocab_size: int = VOCAB_SIZE
    context_length: int = CONTEXT_LENGTH
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    dtype: Any = jnp.float32

    @property
    def vision_heads(self) -> int:
        return max(1, self.vision_width // 64)


CLIP_VARIANTS = {
    "ViT-B/32": ClipConfig(embed_dim=512, image_size=224, patch_size=32,
                           vision_width=768, vision_layers=12),
    "ViT-B/16": ClipConfig(embed_dim=512, image_size=224, patch_size=16,
                           vision_width=768, vision_layers=12),
    "ViT-L/14": ClipConfig(embed_dim=768, image_size=224, patch_size=14,
                           vision_width=1024, vision_layers=24,
                           text_width=768, text_heads=12),
    "ViT-L/16": ClipConfig(embed_dim=768, image_size=384, patch_size=16,
                           vision_width=1024, vision_layers=24,
                           text_width=768, text_heads=12),
    # test/demo-scale variant: real tokenizer vocab, toy towers — lets the
    # application CLIs run end-to-end on a laptop/CI without checkpoints.
    # embed_dim 24 matches LSegConfig.tiny16's out_dim so tiny LSeg map
    # features score against tiny CLIP text like 512-d does at full scale
    "tiny": ClipConfig(embed_dim=24, image_size=32, patch_size=8,
                       vision_width=32, vision_layers=2,
                       text_width=32, text_layers=2, text_heads=2),
}

CLIP_FEAT_DIMS = {
    "RN50": 1024, "RN101": 512, "RN50x4": 640, "RN50x16": 768,
    "RN50x64": 1024, "ViT-B/32": 512, "ViT-B/16": 512, "ViT-L/14": 768,
}


def quick_gelu(x):
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class Attention(nn.Module):
    """Multi-head attention with a fused QKV projection (CLIP layout)."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        b, t, _ = x.shape
        hd = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(z):
            return z.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / np.sqrt(hd)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out")(out)


class ResidualBlock(nn.Module):
    """Pre-LN transformer block with QuickGELU MLP (CLIP layout)."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        x = x + Attention(self.width, self.heads, self.dtype,
                          name="attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x


class TextEncoder(nn.Module):
    """CLIP text transformer -> normalised-ready embedding at the EOT token."""

    cfg: ClipConfig

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.text_width, dtype=cfg.dtype,
                     name="token_embedding")(token_ids)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.text_width))
        x = x + pos.astype(cfg.dtype)
        t = token_ids.shape[1]
        causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
        for i in range(cfg.text_layers):
            x = ResidualBlock(cfg.text_width, cfg.text_heads, cfg.dtype,
                              name=f"block_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        # feature at the EOT token = highest token id in CLIP's vocab
        eot = jnp.argmax(token_ids, axis=1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (cfg.text_width, cfg.embed_dim))
        return jnp.matmul(x, proj.astype(x.dtype),
                          precision=jax.lax.Precision.HIGHEST)


class VisionTransformer(nn.Module):
    """CLIP ViT image encoder -> embedding of the class token."""

    cfg: ClipConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3), already normalised."""
        cfg = self.cfg
        b = images.shape[0]
        x = nn.Conv(cfg.vision_width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                    dtype=cfg.dtype, name="patch_embed")(images)
        x = x.reshape(b, -1, cfg.vision_width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.vision_width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, cfg.vision_width)),
             x], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (n_pos, cfg.vision_width))
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x)
        for i in range(cfg.vision_layers):
            x = ResidualBlock(cfg.vision_width, cfg.vision_heads, cfg.dtype,
                              name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(
            x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (cfg.vision_width, cfg.embed_dim))
        return jnp.matmul(x, proj.astype(x.dtype),
                          precision=jax.lax.Precision.HIGHEST)


class Clip(nn.Module):
    """Joint CLIP model: text + vision towers + learned logit scale."""

    cfg: ClipConfig

    def setup(self):
        self.text = TextEncoder(self.cfg)
        self.visual = VisionTransformer(self.cfg)
        self.logit_scale = self.param("logit_scale",
                                      lambda k: jnp.asarray(np.log(1 / 0.07),
                                                            jnp.float32))

    def encode_text(self, token_ids):
        return self.text(token_ids)

    def encode_image(self, images):
        return self.visual(images)

    def __call__(self, token_ids, images):
        tf = self.encode_text(token_ids)
        vf = self.encode_image(images)
        tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
        vf = vf / jnp.linalg.norm(vf, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * vf @ tf.T


# CLIP's image preprocessing constants (OpenAI release)
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_images(images_uint8: np.ndarray, size: int = 224) -> np.ndarray:
    """Resize (bicubic) + centre-crop + normalise a batch of HWC uint8 images
    to CLIP's input distribution.  Host-side helper (PIL)."""
    from PIL import Image

    out = np.zeros((len(images_uint8), size, size, 3), np.float32)
    for i, img in enumerate(images_uint8):
        if img.shape[0] == 0 or img.shape[1] == 0:
            img = np.zeros((1, 1, 3), np.uint8)
        pil = Image.fromarray(np.uint8(img))
        w, h = pil.size
        short = min(w, h)
        scale = size / short
        pil = pil.resize((max(size, int(round(w * scale))),
                          max(size, int(round(h * scale)))),
                         Image.BICUBIC)
        w, h = pil.size
        left, top = (w - size) // 2, (h - size) // 2
        pil = pil.crop((left, top, left + size, top + size))
        out[i] = np.asarray(pil, np.float32) / 255.0
    return (out - IMAGE_MEAN) / IMAGE_STD
