"""Bilinear resize with explicit align_corners semantics.

torch's F.interpolate(align_corners=True) — used throughout the reference's
DPT fusion blocks and image pyramid (lseg_blocks.py FeatureFusionBlock_custom,
additional_utils/models.py resize_image) — samples source coords as
``i * (in-1)/(out-1)``, while jax.image.resize implements the half-pixel
(align_corners=False) convention.  Both are provided; the align_corners=True
path is a gather + lerp that XLA fuses cleanly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int,
                                  out_w: int) -> jnp.ndarray:
    """NHWC bilinear resize matching torch align_corners=True."""
    b, in_h, in_w, c = x.shape

    def axis_coords(n_in, n_out):
        if n_out == 1 or n_in == 1:
            return (jnp.zeros((n_out,), jnp.float32),
                    jnp.zeros((n_out,), jnp.int32),
                    jnp.zeros((n_out,), jnp.int32))
        coords = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1)
                                                         / (n_out - 1))
        lo = jnp.clip(jnp.floor(coords), 0, n_in - 1).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        return coords - lo.astype(jnp.float32), lo, hi

    wy, y0, y1 = axis_coords(in_h, out_h)
    wx, x0, x1 = axis_coords(in_w, out_w)

    top = jnp.take(x, y0, axis=1)
    bot = jnp.take(x, y1, axis=1)
    rows = top + (bot - top) * wy[None, :, None, None].astype(x.dtype)
    left = jnp.take(rows, x0, axis=2)
    right = jnp.take(rows, x1, axis=2)
    return left + (right - left) * wx[None, None, :, None].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC bilinear resize, half-pixel centres (torch align_corners=False,
    used for the ViT pos-embed resize, lseg_vit.py:149-163)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_h, out_w, c), method="bilinear")
