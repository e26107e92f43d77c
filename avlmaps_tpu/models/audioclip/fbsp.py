"""Frequency-B-spline (FBSP) learnable complex filterbank + signal framing.

Reference: avlmaps/audioclip/model/esresnet/fbsp.py:19-160 (LinearFBSP and
the frame-based spectrogram) and avlmaps/audioclip/utils/transforms.py
frame_signal.  Complex values are carried as a trailing dim of size 2
(re, im), matching the checkpoint layout, and the whole filterbank
application is one big real matmul pair on the MXU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def blackmanharris_window(n: int) -> np.ndarray:
    """Periodic (fftbins=True) 4-term Blackman-Harris window, as
    scipy.signal.get_window('blackmanharris', n) returns it."""
    a = (0.35875, 0.48829, 0.14128, 0.01168)
    k = np.arange(n) * (2 * np.pi / n)
    return (a[0] - a[1] * np.cos(k) + a[2] * np.cos(2 * k)
            - a[3] * np.cos(3 * k)).astype(np.float64)


def frame_signal(signal: jnp.ndarray, frame_length: int, hop_length: int,
                 window: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Split (B, T) signals into overlapping windowed frames
    (B, num_frames, frame_length), centring the required zero padding
    (reference transforms.frame_signal)."""
    t = signal.shape[-1]
    if t <= frame_length:
        num_frames = 1
    else:
        num_frames = 1 + int(math.ceil((t - frame_length) / hop_length))
    pad_len = (num_frames - 1) * hop_length + frame_length
    if pad_len > t:
        extra = pad_len - t
        left, right = extra // 2, extra - extra // 2
        signal = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1)
                         + [(left, right)])
    starts = np.arange(num_frames) * hop_length
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    frames = signal[..., idx]  # (B, num_frames, frame_length)
    if window is not None:
        frames = frames * window
    return frames


def fbsp_weights(m: jnp.ndarray, fb: jnp.ndarray, fc: jnp.ndarray,
                 in_features: int, normalized: bool = True,
                 eps: float = 1e-8) -> jnp.ndarray:
    """Materialise the (out, in, 2) complex FBSP kernels from the learned
    order (m), bandwidth (fb) and centre frequency (fc) parameters
    (reference LinearFBSP._materialize_weights, fbsp.py:67-97)."""
    t = np.pi * jnp.linspace(-1.0, 1.0, in_features).reshape(1, -1) + eps
    m_ = m.reshape(-1, 1)
    fb_ = fb.reshape(-1, 1)
    fc_ = fc.reshape(-1, 1)

    kernel_re = jnp.cos(fc_ * t)
    kernel_im = -jnp.sin(fc_ * t)
    scale = jnp.sqrt(fb_)
    x = fb_ * t / (m_ + eps)
    win = jnp.where(x == 0, jnp.ones_like(x), jnp.sin(x) / x)  # sinc, real

    # complex power win**m for real win, real m:
    #   |win|^m * (cos(m*phase), sin(m*phase)); phase = atan2(0, win)
    mag = jnp.abs(win)
    phase = jnp.arctan2(jnp.zeros_like(win), win)
    mag_out = (mag ** 2) ** (0.5 * m_)
    win_re = mag_out * jnp.cos(m_ * phase)
    win_im = mag_out * jnp.sin(m_ * phase)

    w_re = scale * (win_re * kernel_re - win_im * kernel_im)
    w_im = scale * (win_re * kernel_im + win_im * kernel_re)
    if normalized:
        inv = 1.0 / np.sqrt(in_features)
        w_re = w_re * inv
        w_im = w_im * inv
    return jnp.stack([w_re, w_im], axis=-1)  # (out, in, 2)


def fbsp_apply(frames: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Apply the complex filterbank to real frames:
    (..., in) x (out, in, 2) -> (..., out, 2) — two MXU matmuls
    (reference LinearFBSP.forward real branch, fbsp.py:99-115)."""
    re = jnp.matmul(frames, weights[..., 0].T,
                    preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, weights[..., 1].T,
                    preferred_element_type=jnp.float32)
    return jnp.stack([re, im], axis=-1)


def scale_signal(x: jnp.ndarray, old_min=-32768.0, old_max=32767.0,
                 new_min=-1.0, new_max=1.0) -> jnp.ndarray:
    """Linear range remap (reference transforms.scale via
    base._forward_pre_processing: int16 range -> [-1, 1])."""
    return (x - old_min) / (old_max - old_min) * (new_max - new_min) + new_min
