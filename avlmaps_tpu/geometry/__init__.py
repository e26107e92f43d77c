"""Pure-function geometry: pose transforms, camera projection, grid indexing.

Host-side code (navigation, dataloaders) uses the NumPy functions; the device
map-building pipeline uses the jax.numpy twins (suffix ``_jax``), which are
batched and static-shaped so they fuse under ``jit``.
"""

from avlmaps_tpu.geometry.transforms import (
    quat_xyzw_to_matrix,
    pose_vec_to_tf,
    tf_to_pose_vec,
    base_rot_mat_to_theta,
    conjugate_base_tf,
    theta_to_tf2d,
)
from avlmaps_tpu.geometry.projection import (
    get_sim_cam_mat,
    get_sim_cam_mat_with_fov,
    depth_to_pointcloud,
    depth_to_pointcloud_jax,
    project_points,
    project_points_jax,
    transform_points,
    transform_points_jax,
)
from avlmaps_tpu.geometry.grid import (
    base_pos_to_grid_id,
    base_pos_to_grid_id_batch,
    base_pos_to_grid_id_jax,
    grid_id_to_base_pos,
    grid_id_to_base_pos_batch,
    pos_to_grid_id_2d,
    grid_id_to_pos_2d,
    grid_id_to_cam_pos_batch,
    voxel_linear_id_jax,
    out_of_range_mask_jax,
)

__all__ = [
    "quat_xyzw_to_matrix", "pose_vec_to_tf", "tf_to_pose_vec",
    "base_rot_mat_to_theta", "conjugate_base_tf", "theta_to_tf2d",
    "get_sim_cam_mat", "get_sim_cam_mat_with_fov",
    "depth_to_pointcloud", "depth_to_pointcloud_jax",
    "project_points", "project_points_jax",
    "transform_points", "transform_points_jax",
    "base_pos_to_grid_id", "base_pos_to_grid_id_batch",
    "base_pos_to_grid_id_jax",
    "grid_id_to_base_pos", "grid_id_to_base_pos_batch",
    "pos_to_grid_id_2d", "grid_id_to_pos_2d", "grid_id_to_cam_pos_batch",
    "voxel_linear_id_jax", "out_of_range_mask_jax",
]
