"""Bilinear resize with explicit align_corners semantics.

torch's F.interpolate(align_corners=True) — used throughout the reference's
DPT fusion blocks and image pyramid (lseg_blocks.py FeatureFusionBlock_custom,
additional_utils/models.py resize_image) — samples source coords as
``i * (in-1)/(out-1)``, while jax.image.resize implements the half-pixel
(align_corners=False) convention.

TPU note: bilinear resize is expressed as two small dense matmuls
(out = W_h @ x @ W_w^T per channel) instead of gathers — each interpolation
matrix has two nonzeros per row, but the dense contraction rides the MXU and
is ~20x faster than the gather lowering for channel-heavy maps (measured:
178 ms -> <10 ms for (8, 240, 240, 512) -> 480x480).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _interp_matrix_align_corners(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear weights, align_corners=True convention."""
    w = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        w[:, 0] = 1.0
        return w
    coords = np.arange(n_out) * ((n_in - 1) / (n_out - 1))
    lo = np.clip(np.floor(coords), 0, n_in - 1).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (coords - lo).astype(np.float32)
    rows = np.arange(n_out)
    w[rows, lo] += 1.0 - frac
    w[rows, hi] += frac
    return w


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int,
                                  out_w: int) -> jnp.ndarray:
    """NHWC bilinear resize matching torch align_corners=True."""
    b, in_h, in_w, c = x.shape
    wh = jnp.asarray(_interp_matrix_align_corners(in_h, out_h), x.dtype)
    ww = jnp.asarray(_interp_matrix_align_corners(in_w, out_w), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("ow,bhwc->bhoc", ww, x)


@functools.lru_cache(maxsize=128)
def _interp_matrix_half_pixel(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear weights, half-pixel-centre convention with NO
    antialiasing — torch F.interpolate(mode="bilinear", align_corners=False,
    antialias=False).  jax.image.resize is NOT equivalent when downscaling
    (it widens the kernel to antialias); the reference's pos-embed resize
    (lseg_vit.py:156) downsamples 24x24 -> gh x gw for crops under 384, so
    the convention matters (caught by the reference-tree LSeg oracle)."""
    w = np.zeros((n_out, n_in), np.float32)
    # torch clamps the source coordinate at 0 (aten upsample
    # area_pixel_compute_source_index); the top side clamps via hi index
    coords = np.maximum((np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5, 0.0)
    lo = np.clip(np.floor(coords), 0, n_in - 1).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (coords - lo).astype(np.float32)
    rows = np.arange(n_out)
    w[rows, lo] += 1.0 - frac
    w[rows, hi] += frac
    return w


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC bilinear resize, half-pixel centres (torch align_corners=False,
    used for the ViT pos-embed resize, lseg_vit.py:149-163).

    precision=HIGHEST: this is one tiny op per forward (the pos-embed is
    (1, 577, D)) so the exact-f32 MXU pass is free, and the pos embeds
    feed all 24 blocks — unlike the align-corners feature upsample above,
    which is bandwidth-bound on bf16 features and keeps the default."""
    _, in_h, in_w, _ = x.shape
    wh = jnp.asarray(_interp_matrix_half_pixel(in_h, out_h), x.dtype)
    ww = jnp.asarray(_interp_matrix_half_pixel(in_w, out_w), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("ow,bhwc->bhoc", ww, x,
                      precision=jax.lax.Precision.HIGHEST)
