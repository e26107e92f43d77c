"""3D <-> 2D map pooling ops.

Reference loops: avlmaps/utils/visualize_utils.py:77-94 (pool to 2D) and
avlmaps/map/avlmap.py:100-144 (lift 2D heatmaps back onto voxel slots).
All are single scatter/gather ops here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pool_3d_label_to_2d(mask_3d, grid_pos, gs: int) -> np.ndarray:
    """OR-pool voxel labels onto the top-down grid
    (reference pool_3d_label_to_2d, visualize_utils.py:77-83)."""
    mask_3d = jnp.asarray(mask_3d, bool)
    grid_pos = jnp.asarray(grid_pos, jnp.int32)
    out = jnp.zeros((gs, gs), bool)
    out = out.at[grid_pos[:, 0], grid_pos[:, 1]].max(mask_3d, mode="drop")
    return np.asarray(jax.device_get(out))


def pool_3d_value_to_2d_max(values, grid_pos, gs: int) -> np.ndarray:
    """Max-pool per-voxel scalars onto the top-down grid."""
    values = jnp.asarray(values, jnp.float32)
    grid_pos = jnp.asarray(grid_pos, jnp.int32)
    out = jnp.zeros((gs, gs), jnp.float32)
    out = out.at[grid_pos[:, 0], grid_pos[:, 1]].max(values, mode="drop")
    return np.asarray(jax.device_get(out))


def pool_3d_rgb_to_2d(rgb, grid_pos, gs: int) -> np.ndarray:
    """Top-down RGB: colour of the highest voxel in each column.

    The reference's pool_3d_rgb_to_2d (visualize_utils.py:86-94) intends this
    but never updates its height buffer, so it degrades to last-write-wins;
    we implement the intended highest-voxel semantics via an argmax-by-height
    scatter.
    """
    rgb = np.asarray(rgb)
    grid_pos = np.asarray(grid_pos, np.int64)
    # encode (height, slot) so np.maximum.at picks the highest voxel's slot
    n = grid_pos.shape[0]
    keys = grid_pos[:, 2] * (n + 1) + np.arange(n)
    best = np.full((gs, gs), -1, np.int64)
    np.maximum.at(best, (grid_pos[:, 0], grid_pos[:, 1]), keys)
    out = np.zeros((gs, gs, 3), rgb.dtype)
    hit = best >= 0
    out[hit] = rgb[best[hit] % (n + 1)]
    return out


def lift_2d_to_3d(heatmap_2d, grid_pos) -> np.ndarray:
    """Broadcast a (gs, gs) heatmap onto voxel slots by their (row, col)
    (reference avlmap.py:100-144, which loops over occupied_ids)."""
    heatmap_2d = np.asarray(heatmap_2d)
    grid_pos = np.asarray(grid_pos, np.int64)
    return heatmap_2d[grid_pos[:, 0], grid_pos[:, 1]].astype(np.float32)
