"""ESResNeXt audio backbone: ResNeXt50-32x4d with stage attention over a
band-split log-power FBSP spectrogram.

Reference: avlmaps/audioclip/model/esresnet/base.py (ResNetWithAttention
:168-400, _ESResNet spectrogram pipeline :557-640) and attention.py.
Inference-only: BatchNorms run on their stored running statistics
(FrozenBatchNorm).  NHWC layout; the adaptive max pools have static sizes
per stage, implemented as separable slice-maxes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from avlmaps_tpu.models.audioclip.fbsp import (
    blackmanharris_window, frame_signal, fbsp_weights, fbsp_apply,
    scale_signal,
)


class FrozenBatchNorm(nn.Module):
    """BatchNorm evaluated with stored running statistics (the audio tower is
    inference-only; reference runs torch BN in eval mode)."""

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


def adaptive_max_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch-compatible adaptive max pool (NHWC), separable slice-max over
    statically-known bins: bin i spans [floor(i*L/out), ceil((i+1)*L/out))."""
    b, h, w, c = x.shape

    def pool_axis(arr, length, out_len, axis):
        if out_len == length:
            return arr
        pieces = []
        for i in range(out_len):
            lo = (i * length) // out_len
            hi = -(-((i + 1) * length) // out_len)
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(lo, hi)
            pieces.append(jnp.max(arr[tuple(sl)], axis=axis, keepdims=True))
        return jnp.concatenate(pieces, axis=axis)

    x = pool_axis(x, h, out_h, 1)
    return pool_axis(x, w, out_w, 2)


class Attention2d(nn.Module):
    """Depthwise + pointwise conv attention gate
    (reference attention.py:7-40): adaptive-max-pool to the gated stage's
    size, conv_depth (grouped), conv_point, BN, sigmoid."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    padding: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, out_hw: Tuple[int, int]):
        x = adaptive_max_pool(x, out_hw[0], out_hw[1])
        x = nn.Conv(self.in_channels, self.kernel_size,
                    padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
                    feature_group_count=self.in_channels, dtype=self.dtype,
                    name="conv_depth")(x)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="conv_point")(x)
        x = FrozenBatchNorm(self.out_channels, name="bn")(x)
        return jax.nn.sigmoid(x)


class Bottleneck(nn.Module):
    """ResNeXt bottleneck (conv1x1 -> grouped conv3x3 -> conv1x1, BN+relu;
    reference base.py:108-168)."""

    planes: int
    stride: int = 1
    groups: int = 32
    base_width: int = 4
    has_downsample: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * self.base_width / 64.0) * self.groups
        out_ch = self.planes * self.expansion
        identity = x
        h = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = FrozenBatchNorm(width, name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(width, (3, 3), strides=(self.stride,) * 2, padding=1,
                    use_bias=False, feature_group_count=self.groups,
                    dtype=self.dtype, name="conv2")(h)
        h = FrozenBatchNorm(width, name="bn2")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = FrozenBatchNorm(out_ch, name="bn3")(h)
        if self.has_downsample:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = FrozenBatchNorm(out_ch, name="downsample_bn")(identity)
        return jax.nn.relu(h + identity)


@dataclasses.dataclass(frozen=True)
class ESResNeXtConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    groups: int = 32
    width_per_group: int = 4
    num_classes: int = 1024  # = AudioCLIP embed dim
    apply_attention: bool = True
    # spectrogram front-end (reference audioclip.py:52-58)
    n_fft: int = 2048
    hop_length: int = 561
    win_length: int = 1654
    normalized: bool = True
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "ESResNeXtConfig":
        return ESResNeXtConfig(layers=(1, 1, 1, 1), groups=4,
                               width_per_group=4, num_classes=16,
                               n_fft=64, hop_length=32, win_length=48)


class ESResNeXtFBSP(nn.Module):
    """Full audio tower: raw int16-scaled waveform -> embedding.

    Pipeline (reference _ESResNetFBSP.spectrogram fbsp.py:140-160 +
    _ESResNet._forward_* base.py:599-640): frame -> pad to n_fft -> FBSP
    complex filterbank -> band-split into 3 channels -> log10 power x10 ->
    ResNeXt with attention -> global pool -> fc.
    """

    cfg: ESResNeXtConfig

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = scale_signal(audio.astype(jnp.float32))

        window = jnp.asarray(blackmanharris_window(cfg.win_length),
                             jnp.float32)
        frames = frame_signal(x, cfg.win_length, cfg.hop_length, window)
        if cfg.n_fft > cfg.win_length:
            pad = cfg.n_fft - cfg.win_length
            frames = jnp.pad(frames, [(0, 0), (0, 0),
                                      (pad // 2, pad - pad // 2)])

        n_out = cfg.n_fft // 2 + 1
        m = self.param("fbsp_m", nn.initializers.zeros, (n_out,))
        fb = self.param("fbsp_fb", nn.initializers.ones, (n_out,))
        fc = self.param("fbsp_fc",
                        lambda k, shape: jnp.arange(shape[0],
                                                    dtype=jnp.float32),
                        (n_out,))
        w = fbsp_weights(m, fb, fc, cfg.n_fft, normalized=cfg.normalized)
        spec = fbsp_apply(frames, w)  # (B, F, n_out, 2)
        spec = jnp.swapaxes(spec, 1, 2)  # (B, n_out, F, 2)

        # band split into the conv stem's 3 channels
        # (reference split_spectrogram, base.py:575-583)
        per_band = spec.shape[1] // 3
        spec = spec[:, :3 * per_band]
        pow_spec = spec[..., 0] ** 2 + spec[..., 1] ** 2  # (B, 3*pb, F)
        pow_spec = jnp.where(pow_spec > 0.0, pow_spec, 1e-18)
        x_db = 10.0 * jnp.log10(pow_spec)
        b = x_db.shape[0]
        x_db = x_db.reshape(b, 3, per_band, -1)  # (B, 3, H, W)
        x = x_db.transpose(0, 2, 3, 1)  # NHWC

        # stem
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=cfg.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = jax.nn.relu(x)
        # torch MaxPool2d pads with -inf, same as flax max_pool
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        att_specs = [
            (64, 256, (3, 1), (1, 0)),
            (256, 512, (1, 5), (0, 2)),
            (512, 1024, (3, 1), (1, 0)),
            (1024, 2048, (1, 5), (0, 2)),
        ]
        exp = Bottleneck.expansion
        planes = (64, 128, 256, 512)
        in_ch = 64
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            x_att = x
            for blk in range(cfg.layers[stage]):
                s = stride if blk == 0 else 1
                need_ds = blk == 0 and (s != 1
                                        or in_ch != planes[stage] * exp)
                x = Bottleneck(planes[stage], stride=s, groups=cfg.groups,
                               base_width=cfg.width_per_group,
                               has_downsample=need_ds, dtype=cfg.dtype,
                               name=f"layer{stage + 1}_{blk}")(x)
                in_ch = planes[stage] * exp
            if cfg.apply_attention:
                a_in, _, ks, pad_ = att_specs[stage]
                gate = Attention2d(x_att.shape[-1], x.shape[-1], ks, pad_,
                                   cfg.dtype,
                                   name=f"att{stage + 1}")(
                                       x_att, x.shape[1:3])
                x = x * gate

        # reduction (reference _forward_reduction, base.py:369-381)
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        if cfg.apply_attention:
            gate = Attention2d(x.shape[-1], x.shape[-1], (3, 5), (1, 2),
                               cfg.dtype, name="att5")(x, (1, 1))
            pooled = pooled * gate
        pooled = pooled.reshape(pooled.shape[0], -1)
        return nn.Dense(cfg.num_classes, dtype=cfg.dtype, name="fc")(pooled)
