"""Binary morphology + Gaussian blur as XLA ops.

The reference leans on scipy.ndimage (binary_dilation/erosion/closing,
gaussian_filter) for obstacle-map massaging (avlmaps/map/map.py:169-181,
avlmaps/map/vlmap.py:167-171).  These jax twins let the query path stay on
device; reduce_window lowers to the TPU's native pooling path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("iterations",))
def binary_dilation_jax(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """3x3 full-structure binary dilation, ``iterations`` times
    (scipy.ndimage.binary_dilation with structure=ones((3,3)))."""
    x = jnp.asarray(mask, jnp.float32)
    for _ in range(iterations):
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                                  "SAME")
    return x > 0.5


@functools.partial(jax.jit, static_argnames=("iterations",))
def binary_erosion_jax(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """3x3 full-structure binary erosion (border treated as False, matching
    scipy's default zero padding)."""
    x = jnp.asarray(mask, jnp.float32)
    for _ in range(iterations):
        x = -jax.lax.reduce_window(-x, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                                   "SAME")
        # zero-pad semantics: borders erode
        x = x.at[0, :].set(0.0).at[-1, :].set(0.0)
        x = x.at[:, 0].set(0.0).at[:, -1].set(0.0)
    return x > 0.5


def binary_closing_jax(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Dilate N then erode N (scipy.ndimage.binary_closing(iterations=N),
    used in reference VLMap.get_pos, vlmap.py:168)."""
    return binary_erosion_jax(binary_dilation_jax(mask, iterations),
                              iterations)


def _gaussian_kernel1d(sigma: float, truncate: float) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("sigma", "truncate"))
def gaussian_blur_jax(img: jnp.ndarray, sigma: float = 1.0,
                      truncate: float = 3.0) -> jnp.ndarray:
    """Separable Gaussian blur matching scipy.ndimage.gaussian_filter's
    kernel with the reference's truncate=3 (map.py:173) and 'reflect' boundary
    (= np.pad 'symmetric')."""
    k = jnp.asarray(_gaussian_kernel1d(sigma, truncate))
    r = (k.shape[0] - 1) // 2
    x = jnp.asarray(img, jnp.float32)
    xp = jnp.pad(x, ((r, r), (0, 0)), mode="symmetric")
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                 in_axes=1, out_axes=1)(xp)
    xp = jnp.pad(x, ((0, 0), (r, r)), mode="symmetric")
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"),
                 in_axes=0, out_axes=0)(xp)
    return x
