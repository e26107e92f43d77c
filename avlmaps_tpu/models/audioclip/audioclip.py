"""AudioCLIP: audio embeddings in the CLIP joint space.

Reference: avlmaps/audioclip/model/audioclip.py — CLIP (1024-d embed, text
width 512 x 12 layers) extended with the ESResNeXt-FBSP audio tower and two
extra learned logit scales (audio-image, audio-text, initialised to log 100
and clamped to [1, 100] at use).

All three towers are implemented: the ESResNeXt-FBSP audio head, the CLIP
text transformer and the RN50 ModifiedResNet image tower (the mapping
pipeline itself only exercises audio + text, sound_map.py:102-153; AreaMap/
VLMap use the flax ViT CLIP).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from avlmaps_tpu.models.audioclip.esresnet import (
    ESResNeXtFBSP, ESResNeXtConfig,
)
from avlmaps_tpu.models.audioclip.modified_resnet import (
    ModifiedResNet, ModifiedResNetConfig,
)
from avlmaps_tpu.models.clip.model import ClipConfig, TextEncoder
from avlmaps_tpu.models.clip.tokenizer import default_tokenizer


@dataclasses.dataclass(frozen=True)
class AudioClipConfig:
    embed_dim: int = 1024
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    context_length: int = 77
    vocab_size: int = 49408
    audio: ESResNeXtConfig = ESResNeXtConfig()
    vision: ModifiedResNetConfig = ModifiedResNetConfig()
    dtype: Any = jnp.float32

    def text_config(self) -> ClipConfig:
        return ClipConfig(embed_dim=self.embed_dim,
                          text_width=self.text_width,
                          text_layers=self.text_layers,
                          text_heads=self.text_heads,
                          context_length=self.context_length,
                          vocab_size=self.vocab_size, dtype=self.dtype)

    @staticmethod
    def tiny() -> "AudioClipConfig":
        return AudioClipConfig(embed_dim=16, text_width=32, text_layers=2,
                               text_heads=2, context_length=16,
                               audio=ESResNeXtConfig.tiny(),
                               vision=ModifiedResNetConfig.tiny())


class AudioClip(nn.Module):
    """Audio + text towers with the reference's paired logit scales."""

    cfg: AudioClipConfig

    def setup(self):
        self.audio = ESResNeXtFBSP(dataclasses.replace(
            self.cfg.audio, num_classes=self.cfg.embed_dim))
        self.text = TextEncoder(self.cfg.text_config())
        self.visual = ModifiedResNet(dataclasses.replace(
            self.cfg.vision, embed_dim=self.cfg.embed_dim))
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(float(np.log(1 / 0.07)),
                                                 jnp.float32))
        init_scale = float(np.log(100.0))
        self.logit_scale_ai = self.param(
            "logit_scale_ai", lambda k: jnp.asarray(init_scale, jnp.float32))
        self.logit_scale_at = self.param(
            "logit_scale_at", lambda k: jnp.asarray(init_scale, jnp.float32))

    def encode_audio(self, audio: jnp.ndarray) -> jnp.ndarray:
        return self.audio(audio)

    def encode_text(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        return self.text(token_ids)

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.visual(images)

    def tri_modal(self, audio, images, token_ids):
        """All three pairwise logit matrices (reference AudioCLIP.forward,
        audioclip.py:139-196): (audio x image, audio x text, image x text)
        with per-pair clamped scales."""
        def norm(z):
            return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

        af = norm(self.encode_audio(audio))
        vf = norm(self.encode_image(images))
        tf = norm(self.encode_text(token_ids))
        s_ai = jnp.clip(jnp.exp(self.logit_scale_ai), 1.0, 100.0)
        s_at = jnp.clip(jnp.exp(self.logit_scale_at), 1.0, 100.0)
        s_it = jnp.clip(jnp.exp(self.logit_scale), 1.0, 100.0)
        return s_ai * af @ vf.T, s_at * af @ tf.T, s_it * vf @ tf.T

    def __call__(self, audio: jnp.ndarray,
                 token_ids: jnp.ndarray) -> jnp.ndarray:
        """Audio-text logits (reference forward :139-196, audio-text pair):
        clamp(exp(logit_scale_at), 1, 100) * A_norm @ T_norm^T."""
        af = self.encode_audio(audio)
        tf = self.encode_text(token_ids)
        af = af / jnp.linalg.norm(af, axis=-1, keepdims=True)
        tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
        scale = jnp.clip(jnp.exp(self.logit_scale_at), 1.0, 100.0)
        return scale * af @ tf.T


class AudioClipEncoder:
    """Stateful wrapper: jitted audio/text feature extraction + logits.

    Matches the reference SoundMap usage: audio features are L2-normalised
    at map build time (audio_utils.encode_audio_batch) and scored against
    text with the clamped logit scale (sound_map.py:102-153).
    """

    SAMPLE_LEN = 220500  # 5 s @ 44.1 kHz (reference sound_map.py:41-47)

    def __init__(self, cfg: Optional[AudioClipConfig] = None,
                 params=None, seed: int = 0, tokenizer=None):
        self.cfg = cfg or AudioClipConfig()
        self.model = AudioClip(self.cfg)
        self.tokenizer = tokenizer or default_tokenizer()
        if params is None:
            k = jax.random.PRNGKey(seed)
            img = self.cfg.vision.image_size
            # init through tri_modal so all three towers materialise
            params = jax.jit(lambda k, a, v, t: self.model.init(
                k, a, v, t, method=AudioClip.tri_modal))(
                    k, jnp.zeros((1, self._sample_len()), jnp.float32),
                    jnp.zeros((1, img, img, 3), jnp.float32),
                    jnp.zeros((1, self.cfg.context_length), jnp.int32))
        self.params = params
        self._audio_fwd = jax.jit(lambda p, a: self.model.apply(
            p, a, method=AudioClip.encode_audio))
        self._text_fwd = jax.jit(lambda p, t: self.model.apply(
            p, t, method=AudioClip.encode_text))
        self._image_fwd = jax.jit(lambda p, x: self.model.apply(
            p, x, method=AudioClip.encode_image))

    def _sample_len(self) -> int:
        # tiny configs use a shorter probe signal
        return 2048 if self.cfg.audio.n_fft < 256 else self.SAMPLE_LEN

    def prepare_audio(self, audio: np.ndarray,
                      out_len: Optional[int] = None) -> np.ndarray:
        """Pad (centred) / crop (centred) to the fixed sample length —
        eval-mode semantics of the reference's RandomPadding/RandomCrop
        transforms (audioclip/utils/transforms.py:64-199)."""
        out_len = out_len or self._sample_len()
        t = audio.shape[-1]
        if t < out_len:
            extra = out_len - t
            left = extra // 2
            audio = np.pad(audio, [(0, 0)] * (audio.ndim - 1)
                           + [(left, extra - left)])
        elif t > out_len:
            left = (t - out_len) // 2
            audio = audio[..., left:left + out_len]
        return audio

    def encode_audio_batch(self, clips: Sequence[np.ndarray],
                           batch_size: int = 10) -> np.ndarray:
        """L2-normalised audio embeddings (reference
        audio_utils.encode_audio_batch :602-648, batch 10)."""
        prepared = np.stack([self.prepare_audio(np.asarray(c, np.float32))
                             for c in clips])
        out = np.zeros((len(clips), self.cfg.embed_dim), np.float32)
        for s in range(0, len(clips), batch_size):
            chunk = prepared[s:s + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.tile(chunk[-1:],
                                                       (pad, 1))])
            feats = np.asarray(jax.device_get(
                self._audio_fwd(self.params, jnp.asarray(chunk))),
                np.float32)
            feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
            out[s:s + batch_size] = feats[:batch_size - pad]
        return out

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        """L2-normalised text embeddings (reference AudioCLIP.encode_text:
        entity lists joined with ', ')."""
        joined = [", ".join(t) if isinstance(t, (list, tuple)) else t
                  for t in texts]
        tokens = self.tokenizer(joined, self.cfg.context_length)
        feats = np.asarray(jax.device_get(
            self._text_fwd(self.params, jnp.asarray(tokens))), np.float32)
        return feats / np.linalg.norm(feats, axis=-1, keepdims=True)

    def audio_text_logits(self, audio_feats: np.ndarray,
                          text_feats: np.ndarray) -> np.ndarray:
        """scale_at * A @ T^T with the clamped learned scale
        (reference sound_map.py:107-114)."""
        scale = float(np.clip(
            np.exp(np.asarray(jax.device_get(
                self.params["params"]["logit_scale_at"]))), 1.0, 100.0))
        return scale * audio_feats @ text_feats.T
