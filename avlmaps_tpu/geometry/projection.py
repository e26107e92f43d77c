"""Camera intrinsics, depth backprojection and point projection.

Reference semantics: avlmaps/utils/mapping_utils.py:226-251 (depth2pc),
:305-315 (transform_pc), :591-622 (intrinsics + project_point[s]).

The JAX variants operate on (N, 3) row-vector point clouds (TPU-friendly:
last dim small & contiguous, batch dim large) rather than the reference's
(3, N) column layout, and keep every shape static.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# intrinsics
# ---------------------------------------------------------------------------


def get_sim_cam_mat(h: int, w: int) -> np.ndarray:
    """Simulator-style pinhole intrinsics with fx = fy = w/2
    (reference mapping_utils.py:591-596)."""
    cam_mat = np.eye(3)
    cam_mat[0, 0] = cam_mat[1, 1] = w / 2.0
    cam_mat[0, 2] = w / 2.0
    cam_mat[1, 2] = h / 2.0
    return cam_mat


def get_sim_cam_mat_with_fov(h: int, w: int, fov: float) -> np.ndarray:
    """Pinhole intrinsics from a horizontal FOV in degrees
    (reference mapping_utils.py:617-622)."""
    cam_mat = np.eye(3)
    cam_mat[0, 0] = cam_mat[1, 1] = w / (2.0 * np.tan(np.deg2rad(fov / 2)))
    cam_mat[0, 2] = w / 2.0
    cam_mat[1, 2] = h / 2.0
    return cam_mat


# ---------------------------------------------------------------------------
# depth -> point cloud
# ---------------------------------------------------------------------------


def depth_to_pointcloud(depth: np.ndarray, intr_mat: np.ndarray | None = None,
                        fov: float = 90, min_depth: float = 0.1,
                        max_depth: float = 10.0):
    """Backproject a depth image into camera-frame points.

    Returns ``(points (N,3), valid_mask (N,))`` where N = h*w, pixel order is
    row-major, and pixel centres are offset by +0.5 as in the reference
    (mapping_utils.py:226-251).  Points outside [min_depth, max_depth] are
    masked, not dropped (static shape).
    """
    h, w = depth.shape
    cam_mat = intr_mat if intr_mat is not None else get_sim_cam_mat_with_fov(h, w, fov)
    inv = np.linalg.inv(cam_mat)
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    uv1 = np.stack([x.ravel() + 0.5, y.ravel() + 0.5, np.ones(h * w)], axis=0)
    pc = (inv @ uv1) * depth.reshape(1, -1)
    mask = (pc[2] > min_depth) & (pc[2] < max_depth)
    return pc.T, mask


def depth_to_pointcloud_jax(depth: jnp.ndarray, inv_intr: jnp.ndarray,
                            min_depth: float = 0.1, max_depth: float = 6.0):
    """JAX twin of :func:`depth_to_pointcloud`.

    ``depth``: (h, w) float32; ``inv_intr``: (3, 3) inverse intrinsics.
    Returns ``(points (h*w, 3) float32, mask (h*w,) bool)``.
    """
    h, w = depth.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    uv1 = jnp.stack([xs.ravel(), ys.ravel(), jnp.ones((h * w,), jnp.float32)],
                    axis=-1)  # (N, 3)
    # tiny (N,3)x(3,3) contraction: keep f32 (TPU matmuls default to bf16)
    rays = jnp.matmul(uv1, inv_intr.T, precision=jax.lax.Precision.HIGHEST)
    pc = rays * depth.reshape(-1, 1)
    z = pc[:, 2]
    mask = (z > min_depth) & (z < max_depth)
    return pc, mask


# ---------------------------------------------------------------------------
# point transforms & projection
# ---------------------------------------------------------------------------


def transform_points(points: np.ndarray, pose: np.ndarray) -> np.ndarray:
    """Apply a 4x4 pose to (N, 3) points (reference transform_pc,
    mapping_utils.py:305-315, transposed layout)."""
    return points @ pose[:3, :3].T + pose[:3, 3]


def transform_points_jax(points: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(points, pose[:3, :3].T,
                      precision=jax.lax.Precision.HIGHEST) + pose[:3, 3]


def project_points(cam_mat: np.ndarray, points: np.ndarray):
    """Project (N, 3) camera-frame points to integer pixel coords.

    Matches reference project_points (mapping_utils.py:599-614): perspective
    divide then ``int(u - 0.5)`` truncation toward zero.
    Returns (x (N,), y (N,), z (N,)).
    """
    uvw = points @ cam_mat.T
    z = uvw[:, 2]
    uv = uvw[:, :2] / uvw[:, 2:3]
    x = (uv[:, 0] - 0.5).astype(int)
    y = (uv[:, 1] - 0.5).astype(int)
    return x, y, z


def project_points_jax(cam_mat: jnp.ndarray, points: jnp.ndarray):
    """JAX twin of :func:`project_points`.

    Uses the same truncation-toward-zero as python ``int()`` so parity with
    the reference holds for (the rare) negative projected coordinates.
    """
    uvw = jnp.matmul(points, cam_mat.T, precision=jax.lax.Precision.HIGHEST)
    z = uvw[:, 2]
    uv = uvw[:, :2] / uvw[:, 2:3]
    x = jnp.trunc(uv[:, 0] - 0.5).astype(jnp.int32)
    y = jnp.trunc(uv[:, 1] - 0.5).astype(jnp.int32)
    return x, y, z
