"""CLIP's ModifiedResNet (RN50) image encoder.

AudioCLIP's visual tower (reference bundled CLIP,
avlmaps/audioclip/model/clip/model.py: 3-conv anti-aliased stem, avgpool
downsampling in bottlenecks, attention-pool head).  Inference-only
(FrozenBatchNorm); NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from avlmaps_tpu.models.audioclip.esresnet import FrozenBatchNorm


@dataclasses.dataclass(frozen=True)
class ModifiedResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    embed_dim: int = 1024
    heads: int = 32
    image_size: int = 224
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "ModifiedResNetConfig":
        return ModifiedResNetConfig(layers=(1, 1, 1, 1), width=8,
                                    embed_dim=16, heads=2, image_size=32)


def _avg_pool(x, k):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class ClipBottleneck(nn.Module):
    """CLIP's anti-aliased bottleneck: stride happens via avg-pool, all convs
    stride 1 (reference clip/model.py Bottleneck)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        identity = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = jax.nn.relu(FrozenBatchNorm(self.planes, name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = jax.nn.relu(FrozenBatchNorm(self.planes, name="bn2")(h))
        if self.stride > 1:
            h = _avg_pool(h, self.stride)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = FrozenBatchNorm(out_ch, name="bn3")(h)
        if self.has_downsample:
            identity = x
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = nn.Conv(out_ch, (1, 1), use_bias=False,
                               dtype=self.dtype,
                               name="downsample_conv")(identity)
            identity = FrozenBatchNorm(out_ch,
                                       name="downsample_bn")(identity)
        return jax.nn.relu(h + identity)


class AttentionPool2d(nn.Module):
    """Mean-token attention pooling head (reference clip/model.py
    AttentionPool2d): prepend the spatial mean, add a learned positional
    embedding, one multi-head attention step with the mean as the query."""

    embed_dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, HW+1, C)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01), (h * w + 1, c))
        tokens = tokens + pos.astype(tokens.dtype)

        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(tokens)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(tokens)
        hd = c // self.heads

        def split(z):
            return z.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (1.0 / np.sqrt(hd))
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        name="c_proj")(out)


class ModifiedResNet(nn.Module):
    cfg: ModifiedResNetConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) normalised; returns (B, embed_dim)."""
        cfg = self.cfg
        w = cfg.width
        x = images
        # 3-conv stem, stride 2 then avgpool (reference stem)
        x = nn.Conv(w // 2, (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, dtype=cfg.dtype, name="conv1")(x)
        x = jax.nn.relu(FrozenBatchNorm(w // 2, name="bn1")(x))
        x = nn.Conv(w // 2, (3, 3), padding=1, use_bias=False,
                    dtype=cfg.dtype, name="conv2")(x)
        x = jax.nn.relu(FrozenBatchNorm(w // 2, name="bn2")(x))
        x = nn.Conv(w, (3, 3), padding=1, use_bias=False, dtype=cfg.dtype,
                    name="conv3")(x)
        x = jax.nn.relu(FrozenBatchNorm(w, name="bn3")(x))
        x = _avg_pool(x, 2)

        in_ch = w
        for stage in range(4):
            planes = w * (2 ** stage)
            stride = 1 if stage == 0 else 2
            for blk in range(cfg.layers[stage]):
                s = stride if blk == 0 else 1
                need_ds = blk == 0 and (s > 1 or in_ch != planes * 4)
                x = ClipBottleneck(planes, stride=s, has_downsample=need_ds,
                                   dtype=cfg.dtype,
                                   name=f"layer{stage + 1}_{blk}")(x)
                in_ch = planes * 4
        return AttentionPool2d(cfg.embed_dim, cfg.heads, cfg.dtype,
                               name="attnpool")(x)
