"""Torch oracle for AudioCLIP's non-text towers, used by the golden-parity
tests: the RN50 ModifiedResNet image encoder and the ESResNeXt-FBSP audio
encoder, with module attribute names chosen so that the reference checkpoint
key layout (visual.*, audio.* — avlmaps/audioclip/model/audioclip.py:96-108)
``load_state_dict``s directly.

This is a from-spec re-implementation (semantics per
avlmaps/audioclip/model/clip/model.py ModifiedResNet/AttentionPool2d,
avlmaps/audioclip/model/esresnet/base.py ResNetWithAttention/_ESResNetFBSP,
attention.py Attention2d, fbsp.py LinearFBSP) — torch runs on the host CPU
only, as the independent numerical oracle for the flax/TPU ports.
"""

from __future__ import annotations

import math
from collections import OrderedDict
from typing import Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# RN50 ModifiedResNet (CLIP visual tower)
# ---------------------------------------------------------------------------


class ClipBottleneck(nn.Module):
    """Anti-aliased bottleneck: all convs stride 1, stride via avg-pool."""

    expansion = 4

    def __init__(self, inplanes: int, planes: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(OrderedDict([
                ("-1", nn.AvgPool2d(stride) if stride > 1
                 else nn.Identity()),
                ("0", nn.Conv2d(inplanes, planes * 4, 1, bias=False)),
                ("1", nn.BatchNorm2d(planes * 4)),
            ]))

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class AttentionPool2d(nn.Module):
    def __init__(self, spacial_dim: int, embed_dim: int, num_heads: int,
                 output_dim: int):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim)
            / embed_dim ** 0.5)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):  # (B, C, H, W)
        b, c, h, w = x.shape
        tokens = x.reshape(b, c, h * w).permute(0, 2, 1)  # (B, HW, C)
        tokens = torch.cat([tokens.mean(1, keepdim=True), tokens], dim=1)
        tokens = tokens + self.positional_embedding[None]
        q = self.q_proj(tokens[:, :1])
        k = self.k_proj(tokens)
        v = self.v_proj(tokens)
        hd = c // self.num_heads

        def split(z):
            return z.reshape(b, -1, self.num_heads, hd).permute(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        logits = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        probs = logits.softmax(dim=-1)
        out = (probs @ v).permute(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
        return self.c_proj(out)


class TorchModifiedResNet(nn.Module):
    """CLIP RN50 image tower with the checkpoint's attribute layout."""

    def __init__(self, layers: Tuple[int, ...] = (3, 4, 6, 3),
                 width: int = 64, embed_dim: int = 1024, heads: int = 32,
                 image_size: int = 224):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self._inplanes = width
        for stage in range(4):
            planes = width * (2 ** stage)
            stride = 1 if stage == 0 else 2
            blocks = [ClipBottleneck(self._inplanes, planes, stride)]
            self._inplanes = planes * 4
            for _ in range(1, layers[stage]):
                blocks.append(ClipBottleneck(self._inplanes, planes))
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
        self.attnpool = AttentionPool2d(image_size // 32, self._inplanes,
                                        heads, embed_dim)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for stage in range(4):
            x = getattr(self, f"layer{stage + 1}")(x)
        return self.attnpool(x)


# ---------------------------------------------------------------------------
# ESResNeXt-FBSP audio tower
# ---------------------------------------------------------------------------


def blackmanharris(n: int) -> torch.Tensor:
    a = (0.35875, 0.48829, 0.14128, 0.01168)
    k = torch.arange(n, dtype=torch.float64) * (2 * math.pi / n)
    return (a[0] - a[1] * torch.cos(k) + a[2] * torch.cos(2 * k)
            - a[3] * torch.cos(3 * k)).float()


def frame_signal(signal: torch.Tensor, frame_length: int, hop_length: int,
                 window: torch.Tensor) -> torch.Tensor:
    t = signal.shape[-1]
    if t <= frame_length:
        num_frames = 1
    else:
        num_frames = 1 + int(math.ceil((t - frame_length) / hop_length))
    pad_len = (num_frames - 1) * hop_length + frame_length
    if pad_len > t:
        extra = pad_len - t
        signal = F.pad(signal, (extra // 2, extra - extra // 2))
    frames = signal.unfold(-1, frame_length, hop_length)
    return frames * window


class LinearFBSP(nn.Module):
    def __init__(self, out_features: int, normalized: bool):
        super().__init__()
        self.out_features = out_features
        self.normalized = normalized
        self.eps = 1e-8
        self.m = nn.Parameter(torch.zeros(out_features))
        self.fb = nn.Parameter(torch.ones(out_features))
        self.fc = nn.Parameter(torch.arange(out_features,
                                            dtype=torch.float32))

    def forward(self, frames: torch.Tensor) -> torch.Tensor:
        n = frames.shape[-1]
        t = (math.pi * torch.linspace(-1.0, 1.0, n).reshape(1, -1)
             + self.eps)
        m = self.m.reshape(-1, 1)
        fb = self.fb.reshape(-1, 1)
        fc = self.fc.reshape(-1, 1)
        kernel_re = torch.cos(fc * t)
        kernel_im = -torch.sin(fc * t)
        scale = fb.sqrt()
        win = fb * t / (m + self.eps)
        win = torch.where(win == 0, torch.ones_like(win),
                          torch.sin(win) / win)
        # complex power win**m for real win / real m
        mag = (win ** 2) ** 0.5
        phase = torch.atan2(torch.zeros_like(win), win)
        mag_out = (mag ** 2) ** (0.5 * m)
        win_re = mag_out * torch.cos(m * phase)
        win_im = mag_out * torch.sin(m * phase)
        w_re = scale * (win_re * kernel_re - win_im * kernel_im)
        w_im = scale * (win_re * kernel_im + win_im * kernel_re)
        if self.normalized:
            w_re = w_re / math.sqrt(n)
            w_im = w_im / math.sqrt(n)
        return torch.stack(
            [F.linear(frames, w_re), F.linear(frames, w_im)], dim=-1)


class Attention2d(nn.Module):
    def __init__(self, in_channels: int, out_channels: int,
                 kernel_size: Tuple[int, int], padding: Tuple[int, int]):
        super().__init__()
        self.conv_depth = nn.Conv2d(in_channels, in_channels, kernel_size,
                                    padding=padding, groups=in_channels)
        self.conv_point = nn.Conv2d(in_channels, out_channels, 1)
        self.bn = nn.BatchNorm2d(out_channels)

    def forward(self, x, size):
        x = F.adaptive_max_pool2d(x, size)
        return torch.sigmoid(self.bn(self.conv_point(self.conv_depth(x))))


class ResNeXtBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes: int, planes: int, stride: int = 1,
                 groups: int = 32, base_width: int = 4):
        super().__init__()
        width = int(planes * base_width / 64.0) * groups
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1,
                               groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(out + identity)


class TorchESResNeXtFBSP(nn.Module):
    """Audio tower: waveform -> FBSP log-power spectrogram -> ResNeXt with
    per-stage attention gates -> fc."""

    def __init__(self, layers: Tuple[int, ...] = (3, 4, 6, 3),
                 groups: int = 32, width_per_group: int = 4,
                 num_classes: int = 1024, n_fft: int = 2048,
                 hop_length: int = 561, win_length: int = 1654,
                 normalized: bool = True):
        super().__init__()
        self.n_fft, self.hop_length, self.win_length = (n_fft, hop_length,
                                                        win_length)
        self.register_buffer("window", blackmanharris(win_length))
        self.fbsp = LinearFBSP(n_fft // 2 + 1, normalized)
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        planes = (64, 128, 256, 512)
        inplanes = 64
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            blocks = [ResNeXtBottleneck(inplanes, planes[stage], stride,
                                        groups, width_per_group)]
            inplanes = planes[stage] * 4
            for _ in range(1, layers[stage]):
                blocks.append(ResNeXtBottleneck(inplanes, planes[stage],
                                                1, groups, width_per_group))
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
        self.att1 = Attention2d(64, 256, (3, 1), (1, 0))
        self.att2 = Attention2d(256, 512, (1, 5), (0, 2))
        self.att3 = Attention2d(512, 1024, (3, 1), (1, 0))
        self.att4 = Attention2d(1024, 2048, (1, 5), (0, 2))
        self.att5 = Attention2d(2048, 2048, (3, 5), (1, 2))
        self.fc = nn.Linear(2048, num_classes)

    def spectrogram_db(self, audio: torch.Tensor) -> torch.Tensor:
        x = (audio + 32768.0) / 65535.0 * 2.0 - 1.0  # int16 -> [-1, 1]
        frames = frame_signal(x, self.win_length, self.hop_length,
                              self.window)
        if self.n_fft > self.win_length:
            pad = self.n_fft - self.win_length
            frames = F.pad(frames, (pad // 2, pad - pad // 2))
        spec = self.fbsp(frames)  # (B, F, n_out, 2)
        spec = spec.transpose(-2, -3)  # (B, n_out, F, 2)
        pb = spec.shape[1] // 3
        spec = spec[:, :3 * pb]
        pow_spec = spec[..., 0] ** 2 + spec[..., 1] ** 2
        pow_spec = torch.where(pow_spec > 0.0, pow_spec,
                               torch.full_like(pow_spec, 1e-18))
        x_db = 10.0 * torch.log10(pow_spec)
        return x_db.reshape(x_db.shape[0], 3, pb, -1)

    def forward(self, audio: torch.Tensor) -> torch.Tensor:
        x = self.spectrogram_db(audio)
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for stage in range(4):
            x_att = x
            x = getattr(self, f"layer{stage + 1}")(x)
            gate = getattr(self, f"att{stage + 1}")(x_att, x.shape[-2:])
            x = x * gate
        x_att = x
        pooled = F.adaptive_avg_pool2d(x, 1)
        pooled = pooled * self.att5(x_att, (1, 1))
        return self.fc(pooled.flatten(1))


class TorchAudioClipTowers(nn.Module):
    """Container whose state-dict keys match the AudioCLIP checkpoint's
    audio.* / visual.* sections, so a reference-named state dict loads with
    strict=False (text keys are top-level in the checkpoint and ignored
    here)."""

    def __init__(self, audio_kwargs=None, visual_kwargs=None):
        super().__init__()
        self.audio = TorchESResNeXtFBSP(**(audio_kwargs or {}))
        self.visual = TorchModifiedResNet(**(visual_kwargs or {}))


def load_towers_from_state_dict(sd, audio_kwargs=None, visual_kwargs=None
                                ) -> TorchAudioClipTowers:
    model = TorchAudioClipTowers(audio_kwargs, visual_kwargs)
    tensors = {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()
               if k.startswith(("audio.", "visual."))}
    missing, unexpected = model.load_state_dict(tensors, strict=False)
    real_missing = [k for k in missing
                    if "window" not in k and "num_batches" not in k]
    if real_missing:
        raise KeyError(f"oracle missing keys: {real_missing[:8]}")
    if unexpected:
        raise KeyError(f"oracle unexpected keys: {unexpected[:8]}")
    return model.eval()
