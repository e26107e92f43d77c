"""World <-> voxel-grid coordinate converters.

Reference semantics: avlmaps/utils/mapping_utils.py:318-376.

Subtlety preserved on purpose: the reference's *scalar* converter
``base_pos2grid_id_3d`` truncates twice (``int(gs/2 - int(x/cs))``), while its
*batch* converter truncates once after the subtraction — the two disagree for
e.g. x/cs = 1.4.  The map-building hot loop uses the scalar form
(vlmap_builder.py:137), so the JAX device path here reproduces the scalar
(double-truncation) semantics; the single-truncation batch form is also
provided under its reference name for completeness.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# 2D converters (top-down maps; reference mapping_utils.py:318-330)
# ---------------------------------------------------------------------------


def pos_to_grid_id_2d(gs: int, cs: float, xx: float, yy: float):
    x = int(gs / 2 + int(xx / cs))
    y = int(gs / 2 - int(yy / cs))
    return [x, y]


def grid_id_to_pos_2d(gs: int, cs: float, x: int, y: int):
    xx = (x - gs / 2) * cs
    zz = (gs / 2 - y) * cs
    return xx, zz


# ---------------------------------------------------------------------------
# 3D base-frame converters (the map's native indexing)
# ---------------------------------------------------------------------------


def base_pos_to_grid_id(gs: int, cs: float, x: float, y: float, z: float):
    """Scalar (row, col, height); reference base_pos2grid_id_3d
    (mapping_utils.py:345-350)."""
    row = int(gs / 2 - int(x / cs))
    col = int(gs / 2 - int(y / cs))
    h = int(z / cs)
    return [row, col, h]


def base_pos_to_grid_id_batch(gs: int, cs: float, pos: np.ndarray) -> np.ndarray:
    """(N, 3) positions -> (N, 3) int32 grid ids, single-truncation semantics
    of the reference batch converter (mapping_utils.py:352-359)."""
    row = (gs / 2 - pos[:, 0] / cs).astype(np.int32)
    col = (gs / 2 - pos[:, 1] / cs).astype(np.int32)
    h = (pos[:, 2] / cs).astype(np.int32)
    return np.stack([row, col, h], axis=1)


def base_pos_to_grid_id_jax(gs: int, cs: float, pos: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) float positions -> (N, 3) int32 grid ids on device.

    Reproduces the *scalar* double-truncation semantics used by the
    reference's map-building hot loop (vlmap_builder.py:137).
    """
    row = jnp.trunc(gs / 2 - jnp.trunc(pos[:, 0] / cs))
    col = jnp.trunc(gs / 2 - jnp.trunc(pos[:, 1] / cs))
    h = jnp.trunc(pos[:, 2] / cs)
    return jnp.stack([row, col, h], axis=1).astype(jnp.int32)


def grid_id_to_base_pos(row: int, col: int, height: int, cs: float, gs: int):
    """Scalar inverse; reference grid_id2base_pos_3d (mapping_utils.py:362-366)."""
    base_x = (gs / 2 - row) * cs
    base_y = (gs / 2 - col) * cs
    base_z = height * cs
    return [base_x, base_y, base_z]


def grid_id_to_base_pos_batch(pos_grid: np.ndarray, cs: float, gs: int) -> np.ndarray:
    """(N, 3) int grid ids -> (N, 3) float positions
    (reference grid_id2base_pos_3d_batch, mapping_utils.py:369-376)."""
    base_x = (gs / 2 - pos_grid[:, 0]) * cs
    base_y = (gs / 2 - pos_grid[:, 1]) * cs
    base_z = pos_grid[:, 2] * cs
    return np.stack([base_x, base_y, base_z], axis=1)


def grid_id_to_cam_pos_batch(pos_grid: np.ndarray, camera_height: float,
                             cs: float, gs: int) -> np.ndarray:
    """(N, 3) grid ids -> camera-convention positions (x right, y up, z back)
    (reference grid_id2pos_3d_batch, mapping_utils.py:392-400)."""
    cam_x = (pos_grid[:, 1] - gs / 2) * cs
    cam_z = (gs / 2 - pos_grid[:, 0]) * cs
    cam_y = camera_height - pos_grid[:, 2] * cs
    return np.stack([cam_x, cam_y, cam_z], axis=1)


# ---------------------------------------------------------------------------
# device-side helpers for the voxel-fusion kernel
# ---------------------------------------------------------------------------


def out_of_range_mask_jax(grid_ids: jnp.ndarray, gs: int, vh: int) -> jnp.ndarray:
    """True for ids inside the (gs, gs, vh) grid
    (reference VLMapBuilder._out_of_range, vlmap_builder.py:283-284, negated)."""
    row, col, h = grid_ids[:, 0], grid_ids[:, 1], grid_ids[:, 2]
    return ((row >= 0) & (row < gs) & (col >= 0) & (col < gs)
            & (h >= 0) & (h < vh))


def voxel_linear_id_jax(grid_ids: jnp.ndarray, gs: int, vh: int) -> jnp.ndarray:
    """Flatten (row, col, h) -> row * gs * vh + col * vh + h (int32).

    gs=1000, vh=30 gives 3e7 distinct ids — comfortably inside int32.
    """
    return (grid_ids[:, 0] * (gs * vh) + grid_ids[:, 1] * vh
            + grid_ids[:, 2]).astype(jnp.int32)
