"""Wav2CLIP alternative audio encoder (the reference's ablation path).

The reference embeds sound clips with the pip ``wav2clip`` package — a
log-mel-spectrogram ResNet-18 distilled into CLIP's joint space — and
scores them against CLIP ViT-B/32 text features
(avlmaps/utils/audio_utils.py:695-735).  TPU-native re-implementation:

* spectrogram: hann-window framing + rfft + mel filterbank as one device
  program (the mel projection is a matmul on the MXU);
* encoder: 1-channel ResNet-18 (BasicBlocks, frozen BN) + linear head to
  the CLIP embedding dim;
* weights port from a torchvision-layout ``resnet18`` state dict
  (wav2clip's encoder follows that naming) via
  :func:`port_wav2clip_state_dict`.

Scoring against text reuses the CLIP text tower
(models/clip/features.ClipEncoder), exactly like the reference's
create_wav2clip_audio_text_scores.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from avlmaps_tpu.models.audioclip.esresnet import FrozenBatchNorm


@dataclasses.dataclass(frozen=True)
class Wav2ClipConfig:
    sample_rate: int = 16000
    n_fft: int = 512
    hop_length: int = 160
    n_mels: int = 64
    embed_dim: int = 512
    width: int = 64
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "Wav2ClipConfig":
        return Wav2ClipConfig(n_fft=128, hop_length=64, n_mels=16,
                              embed_dim=16, width=8)


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float | None = None
                   ) -> np.ndarray:
    """HTK-scale triangular mel filterbank (torchaudio MelSpectrogram
    defaults, which wav2clip's frontend uses).  (n_mels, n_fft//2+1)."""
    fmax = fmax or sr / 2.0
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, n_freqs), np.float64)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def log_mel_spectrogram(audio: jnp.ndarray, cfg: Wav2ClipConfig
                        ) -> jnp.ndarray:
    """(B, T) waveform in [-1, 1] -> (B, n_mels, frames) log-mel power."""
    n = cfg.n_fft
    window = jnp.asarray(np.hanning(n + 1)[:-1], jnp.float32)
    t = audio.shape[-1]
    # centre padding (reflect), torchaudio-style
    audio = jnp.pad(audio, [(0, 0), (n // 2, n // 2)], mode="reflect")
    n_frames = 1 + t // cfg.hop_length
    starts = np.arange(n_frames) * cfg.hop_length
    idx = starts[:, None] + np.arange(n)[None, :]
    frames = audio[:, idx] * window  # (B, F, n_fft)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    power = jnp.abs(spec) ** 2  # (B, F, n_fft//2+1)
    mel = jnp.asarray(mel_filterbank(cfg.sample_rate, n, cfg.n_mels))
    mel_spec = jnp.einsum("bfk,mk->bmf", power, mel,
                          preferred_element_type=jnp.float32)
    return jnp.log(mel_spec + 1e-6)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = jax.nn.relu(FrozenBatchNorm(self.planes, name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = FrozenBatchNorm(self.planes, name="bn2")(h)
        if self.has_downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.planes,
                                       name="downsample_bn")(identity)
        return jax.nn.relu(h + identity)


class Wav2Clip(nn.Module):
    """Log-mel ResNet-18 -> CLIP-space embedding."""

    cfg: Wav2ClipConfig

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """audio: (B, T) float32 in [-1, 1].  Returns (B, embed_dim)."""
        cfg = self.cfg
        x = log_mel_spectrogram(audio, cfg)[..., None]  # (B, M, F, 1)
        w = cfg.width
        x = nn.Conv(w, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=cfg.dtype, name="conv1")(x)
        x = jax.nn.relu(FrozenBatchNorm(w, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        in_ch = w
        for stage, n_blocks in enumerate(cfg.layers):
            planes = w * (2 ** stage)
            stride = 1 if stage == 0 else 2
            for blk in range(n_blocks):
                s = stride if blk == 0 else 1
                need_ds = blk == 0 and (s != 1 or in_ch != planes)
                x = BasicBlock(planes, stride=s, has_downsample=need_ds,
                               dtype=cfg.dtype,
                               name=f"layer{stage + 1}_{blk}")(x)
                in_ch = planes
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name="fc")(x)


def _t(v) -> np.ndarray:
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                      else v, np.float32)


def port_wav2clip_state_dict(sd: Dict[str, Any],
                             cfg: Wav2ClipConfig = Wav2ClipConfig()
                             ) -> Dict[str, Any]:
    """torchvision-layout resnet18 state dict -> flax params.  Accepts an
    optional ``encoder.`` / ``model.`` key prefix (the wav2clip release
    wraps the encoder)."""
    for prefix in ("", "encoder.", "model."):
        if f"{prefix}conv1.weight" in sd:
            break
    else:
        raise KeyError("no resnet18 conv1.weight found in state dict")

    def conv(key):
        return {"kernel": _t(sd[f"{prefix}{key}.weight"]
                             ).transpose(2, 3, 1, 0)}

    def bn(key):
        return {"scale": _t(sd[f"{prefix}{key}.weight"]),
                "bias": _t(sd[f"{prefix}{key}.bias"]),
                "mean": _t(sd[f"{prefix}{key}.running_mean"]),
                "var": _t(sd[f"{prefix}{key}.running_var"])}

    params: Dict[str, Any] = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    for stage, n_blocks in enumerate(cfg.layers):
        for blk in range(n_blocks):
            p = f"layer{stage + 1}.{blk}"
            entry = {"conv1": conv(f"{p}.conv1"), "bn1": bn(f"{p}.bn1"),
                     "conv2": conv(f"{p}.conv2"), "bn2": bn(f"{p}.bn2")}
            if f"{prefix}{p}.downsample.0.weight" in sd:
                entry["downsample_conv"] = conv(f"{p}.downsample.0")
                entry["downsample_bn"] = bn(f"{p}.downsample.1")
            params[f"layer{stage + 1}_{blk}"] = entry
    fc_key = f"{prefix}fc.weight"
    if fc_key in sd:
        params["fc"] = {"kernel": _t(sd[fc_key]).T,
                        "bias": _t(sd.get(f"{prefix}fc.bias",
                                          np.zeros(_t(sd[fc_key]).shape[0],
                                                   np.float32)))}
    else:
        raise KeyError("no fc head in state dict")
    return {"params": params}


class Wav2ClipEncoder:
    """Stateful wrapper mirroring AudioClipEncoder's API so SoundMap can
    swap encoders (reference create_wav2clip_audio_map,
    audio_utils.py:695-714)."""

    def __init__(self, cfg: Wav2ClipConfig | None = None, params=None,
                 seed: int = 0, clip_encoder=None):
        self.cfg = cfg or Wav2ClipConfig()
        self.model = Wav2Clip(self.cfg)
        self.embed_dim = self.cfg.embed_dim
        self.clip_encoder = clip_encoder
        if params is None:
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, self.cfg.sample_rate), jnp.float32))
        self.params = params
        self._fwd = jax.jit(self.model.apply)

    def embed_audio_batch(self, clips, batch_size: int = 8) -> np.ndarray:
        """L2-normalised embeddings for equal-length (or padded) clips."""
        t = max(int(np.asarray(c).shape[-1]) for c in clips)
        batch = np.zeros((len(clips), t), np.float32)
        for i, c in enumerate(clips):
            c = np.asarray(c, np.float32)
            batch[i, :c.shape[-1]] = c
        out = np.zeros((len(clips), self.embed_dim), np.float32)
        for s in range(0, len(clips), batch_size):
            chunk = batch[s:s + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.tile(chunk[-1:],
                                                       (pad, 1))])
            f = np.asarray(jax.device_get(
                self._fwd(self.params, jnp.asarray(chunk))), np.float32)
            f = f / np.maximum(
                np.linalg.norm(f, axis=-1, keepdims=True), 1e-8)
            out[s:s + batch_size] = f[:batch_size - pad]
        return out

    def audio_text_scores(self, audio_features: np.ndarray,
                          text_categories) -> np.ndarray:
        """Score wav2clip audio features against CLIP text features
        (reference create_wav2clip_audio_text_scores,
        audio_utils.py:716-735)."""
        if self.clip_encoder is None:
            from avlmaps_tpu.models.clip import ClipEncoder

            self.clip_encoder = ClipEncoder("ViT-B/32")
        text_feats = self.clip_encoder.get_text_feats(list(text_categories))
        return np.asarray(audio_features, np.float32) @ \
            np.asarray(text_feats, np.float32).T

    # -- AudioClipEncoder-compatible surface so SoundMap can swap encoders
    # (sound_map.py consumes encode_audio_batch / encode_text /
    # audio_text_logits) ----------------------------------------------------

    def encode_audio_batch(self, clips, batch_size: int = 8) -> np.ndarray:
        # sound_map passes int16-scaled waveforms; wav2clip expects [-1, 1]
        scaled = [np.asarray(c, np.float32) / 32768.0 for c in clips]
        return self.embed_audio_batch(scaled, batch_size)

    def encode_text(self, texts) -> np.ndarray:
        if self.clip_encoder is None:
            from avlmaps_tpu.models.clip import ClipEncoder

            self.clip_encoder = ClipEncoder("ViT-B/32")
        joined = [", ".join(t) if isinstance(t, (list, tuple)) else t
                  for t in texts]
        feats = np.asarray(self.clip_encoder.get_text_feats(joined),
                           np.float32)
        return feats / np.maximum(
            np.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)

    def audio_text_logits(self, audio_feats: np.ndarray,
                          text_feats: np.ndarray) -> np.ndarray:
        # wav2clip has no learned audio-text scale; raw cosine similarities
        # (reference create_wav2clip_audio_text_scores uses the bare matmul)
        return np.asarray(audio_feats, np.float32) @ \
            np.asarray(text_feats, np.float32).T
