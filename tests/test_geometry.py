"""Geometry unit tests: round-trip properties and parity with the reference
formulas (modelled on the reference's only real test,
avlmaps/dataloader/habitat_dataloader.py:150-173)."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from avlmaps_tpu.geometry import (
    quat_xyzw_to_matrix, pose_vec_to_tf, tf_to_pose_vec,
    base_rot_mat_to_theta, theta_to_tf2d,
    get_sim_cam_mat, get_sim_cam_mat_with_fov,
    depth_to_pointcloud, depth_to_pointcloud_jax,
    project_points, project_points_jax,
    transform_points, transform_points_jax,
    base_pos_to_grid_id, base_pos_to_grid_id_batch, base_pos_to_grid_id_jax,
    grid_id_to_base_pos, grid_id_to_base_pos_batch,
    pos_to_grid_id_2d, grid_id_to_pos_2d,
    voxel_linear_id_jax, out_of_range_mask_jax,
)
from avlmaps_tpu.geometry.transforms import (
    matrix_to_quat_xyzw, conjugate_base_tf, build_base2cam_tf,
    build_base_transform,
)


def random_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def test_quat_matches_scipy(rng):
    for _ in range(20):
        q = random_quat(rng)
        np.testing.assert_allclose(quat_xyzw_to_matrix(q),
                                   R.from_quat(q).as_matrix(), atol=1e-12)


def test_quat_roundtrip(rng):
    for _ in range(20):
        q = random_quat(rng)
        m = quat_xyzw_to_matrix(q)
        q2 = matrix_to_quat_xyzw(m)
        # q and -q encode the same rotation
        assert (np.allclose(q, q2, atol=1e-9)
                or np.allclose(q, -q2, atol=1e-9))


def test_pose_vec_roundtrip(rng):
    for _ in range(10):
        vec = np.concatenate([rng.normal(size=3) * 5, random_quat(rng)])
        tf = pose_vec_to_tf(vec)
        vec2 = tf_to_pose_vec(tf)
        np.testing.assert_allclose(vec[:3], vec2[:3], atol=1e-9)
        tf2 = pose_vec_to_tf(vec2)
        np.testing.assert_allclose(tf, tf2, atol=1e-9)


def test_heading_extraction():
    for theta in np.linspace(-np.pi + 0.01, np.pi - 0.01, 17):
        tf = theta_to_tf2d(theta, (1.0, 2.0, 0.0))
        assert abs(base_rot_mat_to_theta(tf[:3, :3]) - theta) < 1e-9


def test_base_transform_construction():
    # defaults from reference config/map_config/vlmaps.yaml:2-10
    b2c = build_base2cam_tf((1, 0, 0, 0, -1, 0, 0, 0, -1), 1.5)
    assert b2c[1, 3] == 1.5
    bt = build_base_transform((0, 0, -1), (-1, 0, 0), (0, 1, 0))
    assert np.allclose(np.linalg.det(bt[:3, :3]), 1.0)
    # conjugation of identity is identity
    np.testing.assert_allclose(conjugate_base_tf(bt, np.eye(4)), np.eye(4),
                               atol=1e-12)


def test_intrinsics():
    cam = get_sim_cam_mat(480, 640)
    assert cam[0, 0] == 320 and cam[0, 2] == 320 and cam[1, 2] == 240
    cam_fov = get_sim_cam_mat_with_fov(480, 640, 90)
    np.testing.assert_allclose(cam_fov[0, 0], 320.0, rtol=1e-6)


def test_depth_backprojection_inverse(rng):
    """depth2pc then project_points must return the original pixels."""
    h, w = 48, 64
    depth = rng.uniform(0.5, 5.0, size=(h, w))
    cam = get_sim_cam_mat(h, w)
    pc, mask = depth_to_pointcloud(depth, intr_mat=cam, max_depth=10)
    assert mask.all()
    x, y, z = project_points(cam, pc)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # pixel centres sit exactly on the int(u - 0.5) truncation boundary, so
    # float epsilon legitimately flips some pixels down by one (the reference
    # has the identical boundary behaviour) — allow off-by-one there
    assert np.abs(x - xs.ravel()).max() <= 1
    assert np.abs(y - ys.ravel()).max() <= 1
    assert (x == xs.ravel()).mean() > 0.8
    np.testing.assert_allclose(z, depth.ravel(), rtol=1e-9)


def test_depth_backprojection_jax_matches_numpy(rng):
    h, w = 32, 40
    depth = rng.uniform(0.05, 8.0, size=(h, w)).astype(np.float32)
    cam = get_sim_cam_mat(h, w)
    pc_np, mask_np = depth_to_pointcloud(depth, intr_mat=cam, min_depth=0.1,
                                         max_depth=6.0)
    pc_j, mask_j = depth_to_pointcloud_jax(jnp.asarray(depth),
                                           jnp.asarray(np.linalg.inv(cam),
                                                       dtype=jnp.float32),
                                           min_depth=0.1, max_depth=6.0)
    np.testing.assert_allclose(np.asarray(pc_j), pc_np, rtol=2e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(mask_j), mask_np)


def test_project_points_jax_matches_numpy(rng):
    pts = rng.uniform(-2, 2, size=(100, 3))
    pts[:, 2] = rng.uniform(0.5, 5, size=100)
    cam = get_sim_cam_mat(480, 640)
    x, y, z = project_points(cam, pts)
    xj, yj, zj = project_points_jax(jnp.asarray(cam, dtype=jnp.float32),
                                    jnp.asarray(pts, dtype=jnp.float32))
    np.testing.assert_array_equal(np.asarray(xj), x)
    np.testing.assert_array_equal(np.asarray(yj), y)
    np.testing.assert_allclose(np.asarray(zj), z, rtol=1e-5)


def test_transform_points(rng):
    pose = pose_vec_to_tf(np.concatenate([rng.normal(size=3),
                                          random_quat(rng)]))
    pts = rng.normal(size=(50, 3))
    out = transform_points(pts, pose)
    expected = (pose @ np.concatenate(
        [pts.T, np.ones((1, 50))], axis=0))[:3].T
    np.testing.assert_allclose(out, expected, atol=1e-12)
    out_j = transform_points_jax(jnp.asarray(pts), jnp.asarray(pose))
    np.testing.assert_allclose(np.asarray(out_j), expected, atol=1e-5)


class TestGridConverters:
    GS, CS = 1000, 0.05

    def test_scalar_matches_reference_formula(self, rng):
        for _ in range(100):
            x, y = rng.uniform(-20, 20, size=2)
            z = rng.uniform(0, 1.4)
            row, col, h = base_pos_to_grid_id(self.GS, self.CS, x, y, z)
            assert row == int(self.GS / 2 - int(x / self.CS))
            assert col == int(self.GS / 2 - int(y / self.CS))
            assert h == int(z / self.CS)

    def test_jax_matches_scalar_semantics(self, rng):
        pos = np.stack([rng.uniform(-20, 20, 256), rng.uniform(-20, 20, 256),
                        rng.uniform(-1, 2, 256)], axis=1)
        got = np.asarray(base_pos_to_grid_id_jax(self.GS, self.CS,
                                                 jnp.asarray(pos, jnp.float32)))
        for i in range(256):
            expected = base_pos_to_grid_id(self.GS, self.CS, *pos[i])
            np.testing.assert_array_equal(got[i], expected)

    def test_batch_single_truncation(self):
        # the reference's batch converter truncates once; x/cs = 1.4 exposes it
        pos = np.array([[0.07, 0.0, 0.0]])
        batch = base_pos_to_grid_id_batch(self.GS, self.CS, pos)
        scalar = base_pos_to_grid_id(self.GS, self.CS, 0.07, 0.0, 0.0)
        assert batch[0, 0] == 498 and scalar[0] == 499  # documented mismatch

    def test_roundtrip_within_cell(self, rng):
        for _ in range(50):
            row, col, h = rng.integers(0, self.GS, 2).tolist() + [
                int(rng.integers(0, 30))]
            x, y, z = grid_id_to_base_pos(row, col, h, self.CS, self.GS)
            row2, col2, h2 = base_pos_to_grid_id(self.GS, self.CS, x, y, z)
            assert abs(row2 - row) <= 1 and abs(col2 - col) <= 1
            assert abs(h2 - h) <= 1

    def test_batch_inverse(self, rng):
        grid = rng.integers(0, self.GS, size=(64, 3)).astype(np.int32)
        pos = grid_id_to_base_pos_batch(grid, self.CS, self.GS)
        for i in range(64):
            expected = grid_id_to_base_pos(*grid[i], self.CS, self.GS)
            np.testing.assert_allclose(pos[i], expected)

    def test_2d_converters(self):
        x, y = pos_to_grid_id_2d(self.GS, self.CS, 1.0, -1.0)
        assert x == 520 and y == 520
        xx, zz = grid_id_to_pos_2d(self.GS, self.CS, 520, 520)
        assert xx == 1.0 and zz == -1.0

    def test_voxel_linear_id(self):
        gs, vh = 100, 30
        ids = jnp.asarray([[0, 0, 0], [1, 2, 3], [99, 99, 29]], jnp.int32)
        lin = np.asarray(voxel_linear_id_jax(ids, gs, vh))
        np.testing.assert_array_equal(
            lin, [0, 1 * 3000 + 2 * 30 + 3, 99 * 3000 + 99 * 30 + 29])

    def test_out_of_range(self):
        gs, vh = 100, 30
        ids = jnp.asarray([[0, 0, 0], [-1, 0, 0], [0, 100, 0], [0, 0, 30],
                           [99, 99, 29]], jnp.int32)
        mask = np.asarray(out_of_range_mask_jax(ids, gs, vh))
        np.testing.assert_array_equal(mask, [True, False, False, False, True])
