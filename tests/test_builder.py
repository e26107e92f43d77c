"""End-to-end VLMap builder tests on a synthetic scene (no Habitat needed),
plus multi-chip sharded fusion vs the single-device path on the virtual
8-device CPU mesh (SURVEY.md §4c/§4d)."""

import os
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avlmaps_tpu.config import load_config
from avlmaps_tpu.geometry.projection import get_sim_cam_mat
from avlmaps_tpu.geometry.transforms import (
    build_base2cam_tf, build_base_transform,
)
from avlmaps_tpu.map.vlmap_builder import (
    VLMapBuilder, make_frame_step, sample_pixels,
)
from avlmaps_tpu.map.voxel_map import SparseVoxelMap
from avlmaps_tpu.models.lseg import LSegNet, LSegConfig
from avlmaps_tpu.ops.voxel_fusion import init_fusion_state, export_fusion_state

H, W = 32, 32
GS, CS, VH = 64, 0.1, 8


def write_synthetic_scene(root: Path, n_frames: int = 5):
    """rgb/*.png + depth/*.npy + poses.txt in the reference layout
    (dataset/README.md)."""
    import cv2

    rng = np.random.default_rng(0)
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    poses = []
    for i in range(n_frames):
        rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "rgb" / f"{i:06d}.png"),
                    rgb[:, :, ::-1])  # store BGR like the dataset
        depth = rng.uniform(0.3, 1.5, (H, W)).astype(np.float32)
        np.save(root / "depth" / f"{i:06d}.npy", depth)
        # small forward walk in habitat coords: position + identity quat
        poses.append([0.02 * i, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    np.savetxt(root / "poses.txt", np.asarray(poses))
    return root


@pytest.fixture(scope="module")
def tiny_lseg():
    cfg = LSegConfig.tiny16()
    model = LSegNet(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, H, W, 3), jnp.float32))
    return model, params


class TestFrameStep:
    def test_fuses_synthetic_batch(self, tiny_lseg, rng):
        model, params = tiny_lseg
        calib = get_sim_cam_mat(H, W)
        step = make_frame_step(model.apply, gs=GS, cs=CS, vh=VH,
                               calib_mat=calib, image_hw=(H, W),
                               base_size=W, crop_size=W, max_depth=6.0)
        state = init_fusion_state(GS, VH, 24, 4096)
        b, n = 2, 64
        rgb = jnp.asarray(rng.normal(size=(b, H, W, 3)).astype(np.float32))
        depth = jnp.asarray(rng.uniform(0.3, 0.7, (b, H, W)).astype(
            np.float32))
        pose = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        idx = jnp.asarray(sample_pixels(np.random.default_rng(0), H, W, 16,
                                        n, b))
        state = step(state, params, rgb, depth, pose, idx,
                     jnp.ones((b,), bool))
        feats, pos, weight, occ, rgbs = export_fusion_state(state, GS, VH)
        assert feats.shape[0] > 0
        assert (pos[:, 0] < GS).all() and (pos[:, 2] < VH).all()
        assert (weight > 0).all()

    def test_invalid_frames_ignored(self, tiny_lseg, rng):
        model, params = tiny_lseg
        step = make_frame_step(model.apply, gs=GS, cs=CS, vh=VH,
                               calib_mat=get_sim_cam_mat(H, W),
                               image_hw=(H, W), base_size=W, crop_size=W)
        state = init_fusion_state(GS, VH, 24, 4096)
        b, n = 2, 32
        rgb = jnp.zeros((b, H, W, 3), jnp.float32)
        depth = jnp.full((b, H, W), 0.5, jnp.float32)
        pose = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        idx = jnp.asarray(sample_pixels(np.random.default_rng(0), H, W, 16,
                                        n, b))
        state = step(state, params, rgb, depth, pose, idx,
                     jnp.zeros((b,), bool))  # every frame padding
        assert int(state.n_slots) == 0


class TestBuilderE2E:
    def test_build_save_resume(self, tmp_path, tiny_lseg):
        model, params = tiny_lseg
        scene = write_synthetic_scene(tmp_path / "scene", n_frames=5)
        cfg = load_config(overrides=None)
        cfg.map_config.grid_size = GS
        cfg.map_config.cell_size = CS
        cfg.map_config.pose_info.camera_height = CS * VH
        cfg.map_config.cam_calib_mat = tuple(
            get_sim_cam_mat(H, W).reshape(-1))
        cfg.map_config.capacity = 8192
        cfg.map_config.depth_sample_rate = 16
        cfg.map_config.max_pts_per_frame = 64
        cfg.map_config.max_depth = 6.0

        base2cam = build_base2cam_tf(cfg.map_config.pose_info.base2cam_rot,
                                     cfg.map_config.pose_info.camera_height)
        base_tf = build_base_transform(
            cfg.map_config.pose_info.base_forward_axis,
            cfg.map_config.pose_info.base_left_axis,
            cfg.map_config.pose_info.base_up_axis)

        def make_builder():
            return VLMapBuilder(
                scene, cfg.map_config, scene / "poses.txt",
                sorted((scene / "rgb").glob("*.png")),
                sorted((scene / "depth").glob("*.npy")),
                base2cam, base_tf, lseg_apply=model.apply,
                lseg_params=params, feat_dim=24, batch_size=2)

        m = make_builder().create_mobile_base_map(save_every=0,
                                                  progress=False)
        assert m.num_occupied > 0
        assert m.mapped_iters == set(range(5))
        assert (scene / "vlmap" / "vlmaps.h5df").exists()

        # resume: all frames already mapped -> nothing to do, same map
        m2 = make_builder().create_mobile_base_map(save_every=0,
                                                   progress=False)
        assert m2.mapped_iters == set(range(5))
        np.testing.assert_array_equal(m2.grid_pos, m.grid_pos)
        np.testing.assert_allclose(m2.weight, m.weight, rtol=1e-5)

        # reload through the artifact API
        m3 = SparseVoxelMap.load(scene / "vlmap" / "vlmaps.h5df")
        assert m3.num_occupied == m.num_occupied

    def test_camera_pose_map(self, tmp_path, tiny_lseg):
        """pose_type='camera': poses.txt rows are camera poses; the map is
        centred at the first camera frame (VERDICT item 10; the reference's
        create_camera_map is an unimplemented TODO)."""
        model, params = tiny_lseg
        scene = write_synthetic_scene(tmp_path / "scene", n_frames=4)
        cfg = load_config()
        cfg.map_config.grid_size = GS
        cfg.map_config.cell_size = CS
        cfg.map_config.pose_info.camera_height = CS * VH
        cfg.map_config.cam_calib_mat = tuple(
            get_sim_cam_mat(H, W).reshape(-1))
        cfg.map_config.capacity = 8192
        cfg.map_config.depth_sample_rate = 16
        cfg.map_config.max_pts_per_frame = 64
        cfg.map_config.max_depth = 6.0
        cfg.map_config.lseg_base_size = W
        cfg.map_config.lseg_crop_size = W
        base2cam = build_base2cam_tf(cfg.map_config.pose_info.base2cam_rot,
                                     cfg.map_config.pose_info.camera_height)
        base_tf = build_base_transform(
            cfg.map_config.pose_info.base_forward_axis,
            cfg.map_config.pose_info.base_left_axis,
            cfg.map_config.pose_info.base_up_axis)
        builder = VLMapBuilder(
            scene, cfg.map_config, scene / "poses.txt",
            sorted((scene / "rgb").glob("*.png")),
            sorted((scene / "depth").glob("*.npy")),
            base2cam, base_tf, lseg_apply=model.apply, lseg_params=params,
            feat_dim=24, batch_size=2)
        m = builder.create_camera_map(save_every=0, progress=False)
        assert m.num_occupied > 0
        assert m.mapped_iters == set(range(4))
        # depths span 0.3-1.5m at cs=0.1 -> every voxel within ~16+1 cells
        # of the first camera (grid centre)
        centre = GS // 2
        d = np.abs(m.grid_pos[:, :2].astype(int) - centre).max()
        assert d <= 18, f"camera map not centred: max offset {d}"


class TestShardedParity:
    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_sharded_matches_single_device(self, tiny_lseg, rng):
        from avlmaps_tpu.parallel.sharded import ShardedFusion, make_mesh

        model, params = tiny_lseg
        calib = get_sim_cam_mat(H, W)
        n_dev = 8
        b = n_dev  # one frame per device
        n = 64
        rgb = jnp.asarray(rng.normal(size=(b, H, W, 3)).astype(np.float32))
        depth = jnp.asarray(
            rng.uniform(0.3, 1.2, (b, H, W)).astype(np.float32))
        pose = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        idx = jnp.asarray(sample_pixels(np.random.default_rng(1), H, W, 16,
                                        n, b))
        fvalid = jnp.ones((b,), bool)

        # single-device reference
        step = make_frame_step(model.apply, gs=GS, cs=CS, vh=VH,
                               calib_mat=calib, image_hw=(H, W),
                               base_size=W, crop_size=W)
        sstate = init_fusion_state(GS, VH, 24, 8192)
        sstate = step(sstate, params, rgb, depth, pose, idx, fvalid)
        f1, p1, w1, o1, r1 = export_fusion_state(sstate, GS, VH)

        # sharded — f32 wire format for bit-level parity with single-device
        mesh = make_mesh(n_dev)
        fusion = ShardedFusion(mesh, gs=GS, cs=CS, vh=VH, feat_dim=24,
                               capacity=8192 * n_dev, calib_mat=calib,
                               image_hw=(H, W), lseg_apply=model.apply,
                               base_size=W, crop_size=W,
                               payload_dtype=jnp.float32)
        fusion.step(params, rgb, depth, pose, idx, fvalid)
        f2, p2, w2, o2, r2 = fusion.export()

        # same occupied voxel set, same per-voxel stats (order may differ)
        np.testing.assert_array_equal(o1 >= 0, o2 >= 0)
        k1 = np.lexsort(p1.T)
        k2 = np.lexsort(p2.T)
        np.testing.assert_array_equal(p1[k1], p2[k2])
        np.testing.assert_allclose(w1[k1], w2[k2], rtol=1e-5)
        np.testing.assert_allclose(f1[k1], f2[k2], rtol=1e-3, atol=1e-3)

        # default bf16 wire format: same voxels, features within bf16 noise
        fusion16 = ShardedFusion(mesh, gs=GS, cs=CS, vh=VH, feat_dim=24,
                                 capacity=8192 * n_dev, calib_mat=calib,
                                 image_hw=(H, W), lseg_apply=model.apply,
                                 base_size=W, crop_size=W)
        fusion16.step(params, rgb, depth, pose, idx, fvalid)
        f3, p3, w3, o3, _ = fusion16.export()
        np.testing.assert_array_equal(o1 >= 0, o3 >= 0)
        k3 = np.lexsort(p3.T)
        np.testing.assert_array_equal(p1[k1], p3[k3])
        np.testing.assert_allclose(w1[k1], w3[k3], rtol=1e-5)
        np.testing.assert_allclose(f1[k1], f3[k3], rtol=2e-2, atol=2e-2)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_all_to_all_routing_matches_all_gather(self, tiny_lseg, rng):
        """payload_routing="all_to_all" (owner-binned exchange, ~D/slack x
        fewer ICI bytes, VERDICT r3 #7) must build the same map as the
        replicate-everything all_gather default; bucket overflow must be
        observable in n_dropped."""
        from avlmaps_tpu.parallel.sharded import ShardedFusion, make_mesh

        model, params = tiny_lseg
        calib = get_sim_cam_mat(H, W)
        n_dev = 8
        b, n = n_dev, 64
        rgb = jnp.asarray(rng.normal(size=(b, H, W, 3)).astype(np.float32))
        depth = jnp.asarray(
            rng.uniform(0.3, 1.2, (b, H, W)).astype(np.float32))
        # distinct poses spread ownership across shards
        poses = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
        poses[:, 0, 3] = 0.4 * np.arange(b) - 1.6
        pose = jnp.asarray(poses)
        idx = jnp.asarray(sample_pixels(np.random.default_rng(1), H, W, 16,
                                        n, b))
        fvalid = jnp.ones((b,), bool)
        mesh = make_mesh(n_dev)

        def build(routing, slack=2.0):
            fusion = ShardedFusion(mesh, gs=GS, cs=CS, vh=VH, feat_dim=24,
                                   capacity=8192 * n_dev, calib_mat=calib,
                                   image_hw=(H, W), lseg_apply=model.apply,
                                   base_size=W, crop_size=W,
                                   payload_dtype=jnp.float32,
                                   payload_routing=routing,
                                   a2a_slack=slack)
            fusion.step(params, rgb, depth, pose, idx, fvalid)
            dropped = int(np.sum(jax.device_get(fusion.state.n_dropped)))
            return fusion.export(), dropped

        (f1, p1, w1, o1, _), d1 = build("all_gather")
        # slack=8 => bucket cap == n_pts: lossless for ANY ownership skew
        (f2, p2, w2, o2, _), d2 = build("all_to_all", slack=8.0)
        assert d2 == d1 == 0
        assert (o1 >= 0).sum() > 0
        np.testing.assert_array_equal(o1 >= 0, o2 >= 0)
        k1, k2 = np.lexsort(p1.T), np.lexsort(p2.T)
        np.testing.assert_array_equal(p1[k1], p2[k2])
        np.testing.assert_allclose(w1[k1], w2[k2], rtol=1e-5)
        np.testing.assert_allclose(f1[k1], f2[k2], rtol=1e-4, atol=1e-4)

        # pathological skew: identity poses land every frame's points in
        # the same row band; a tight bucket must DROP and COUNT, not
        # corrupt
        pose_same = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                     (b, 4, 4))
        fusion = ShardedFusion(mesh, gs=GS, cs=CS, vh=VH, feat_dim=24,
                               capacity=8192 * n_dev, calib_mat=calib,
                               image_hw=(H, W), lseg_apply=model.apply,
                               base_size=W, crop_size=W,
                               payload_dtype=jnp.float32,
                               payload_routing="all_to_all", a2a_slack=1.0)
        fusion.step(params, rgb, depth, pose_same, idx, fvalid)
        f3, p3, w3, o3, _ = fusion.export()
        dropped = int(np.sum(jax.device_get(fusion.state.n_dropped)))
        assert dropped > 0  # overflow observable
        # dropped points only ever REMOVE mass: every fused voxel must
        # exist in the lossless build of the same inputs
        fusion_ref = ShardedFusion(mesh, gs=GS, cs=CS, vh=VH, feat_dim=24,
                                   capacity=8192 * n_dev, calib_mat=calib,
                                   image_hw=(H, W), lseg_apply=model.apply,
                                   base_size=W, crop_size=W,
                                   payload_dtype=jnp.float32)
        fusion_ref.step(params, rgb, depth, pose_same, idx, fvalid)
        _, p4, _, o4, _ = fusion_ref.export()
        assert not np.any((o3 >= 0) & ~(o4 >= 0))

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_sharded_uint16_depth_matches_metres(self, tiny_lseg, rng):
        """Packed scenes feed the frame-transport mesh step uint16-mm
        depth; the shard body must rescale it like make_frame_step does
        (regression: raw mm read as metres discarded ~every point)."""
        from avlmaps_tpu.parallel.sharded import ShardedFusion, make_mesh

        model, params = tiny_lseg
        calib = get_sim_cam_mat(H, W)
        n_dev = 8
        b, n = n_dev, 64
        rgb = jnp.asarray(rng.normal(size=(b, H, W, 3)).astype(np.float32))
        # u16 millimetres first; metres derived by the same rescale the
        # device performs, so the two builds see bit-identical depths
        depth_u16_np = rng.integers(300, 1200, (b, H, W)).astype(np.uint16)
        depth_m = depth_u16_np.astype(np.float32) * 1e-3
        depth_u16 = jnp.asarray(depth_u16_np)
        pose = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        idx = jnp.asarray(sample_pixels(np.random.default_rng(1), H, W, 16,
                                        n, b))
        fvalid = jnp.ones((b,), bool)

        def build(depth):
            mesh = make_mesh(n_dev)
            fusion = ShardedFusion(mesh, gs=GS, cs=CS, vh=VH, feat_dim=24,
                                   capacity=8192 * n_dev, calib_mat=calib,
                                   image_hw=(H, W), lseg_apply=model.apply,
                                   base_size=W, crop_size=W,
                                   payload_dtype=jnp.float32)
            fusion.step(params, rgb, depth, pose, idx, fvalid)
            return fusion.export()

        f1, p1, w1, o1, _ = build(jnp.asarray(depth_m))
        f2, p2, w2, o2, _ = build(depth_u16)
        assert (o1 >= 0).sum() > 0  # the scene must actually fuse points
        np.testing.assert_array_equal(o1 >= 0, o2 >= 0)
        k1, k2 = np.lexsort(p1.T), np.lexsort(p2.T)
        np.testing.assert_array_equal(p1[k1], p2[k2])
        np.testing.assert_allclose(f1[k1], f2[k2], rtol=1e-5, atol=1e-5)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_sharded_canvas_matches_single_device(self, tiny_lseg, rng):
        """Canvas-transport multi-chip step vs the single-device canvas step
        (f32 wire format; same CanvasBatch payload both ways)."""
        from avlmaps_tpu.map.vlmap_builder import make_frame_step_canvas
        from avlmaps_tpu.parallel.sharded import ShardedFusion, make_mesh

        model, params = tiny_lseg
        calib = get_sim_cam_mat(H, W)
        n_dev = 8
        b, n = n_dev, 64
        canvas = jnp.asarray(rng.integers(0, 255, (b, H, W, 3)), jnp.uint8)
        z_mm = jnp.asarray((rng.uniform(0.3, 1.2, (b, n)) * 1000.0
                            ).astype(np.uint16))
        rgb_pts = jnp.asarray(rng.integers(0, 255, (b, n, 3)), jnp.uint8)
        pose = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (b, 4, 4))
        idx = jnp.asarray(sample_pixels(np.random.default_rng(2), H, W, 16,
                                        n, b))
        fvalid = jnp.ones((b,), bool)

        step = make_frame_step_canvas(model.apply, gs=GS, cs=CS, vh=VH,
                                      calib_mat=calib, image_hw=(H, W),
                                      base_size=W, crop_size=W,
                                      half_res_apply=False)
        sstate = init_fusion_state(GS, VH, 24, 8192)
        sstate = step(sstate, params, canvas, z_mm, rgb_pts, pose, idx,
                      fvalid)
        f1, p1, w1, o1, r1 = export_fusion_state(sstate, GS, VH)

        mesh = make_mesh(n_dev)
        fusion = ShardedFusion(mesh, gs=GS, cs=CS, vh=VH, feat_dim=24,
                               capacity=8192 * n_dev, calib_mat=calib,
                               image_hw=(H, W), lseg_apply=model.apply,
                               base_size=W, crop_size=W,
                               payload_dtype=jnp.float32,
                               transport="canvas")
        fusion.step(params, canvas, z_mm, rgb_pts, pose, idx, fvalid)
        f2, p2, w2, o2, r2 = fusion.export()

        np.testing.assert_array_equal(o1 >= 0, o2 >= 0)
        k1, k2 = np.lexsort(p1.T), np.lexsort(p2.T)
        np.testing.assert_array_equal(p1[k1], p2[k2])
        np.testing.assert_allclose(w1[k1], w2[k2], rtol=1e-5)
        np.testing.assert_allclose(f1[k1], f2[k2], rtol=1e-3, atol=1e-3)
        # uint8 export truncation can flip one level on accumulation-order
        # rounding differences across shards
        np.testing.assert_allclose(r1[k1].astype(int), r2[k2].astype(int),
                                   atol=1)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_kill_and_resume_matches_uninterrupted(self, tiny_lseg, rng):
        """Export mid-build, restore into a fresh ShardedFusion, continue:
        the final map must match the uninterrupted build (VERDICT item 4)."""
        from avlmaps_tpu.parallel.sharded import ShardedFusion, make_mesh

        model, params = tiny_lseg
        calib = get_sim_cam_mat(H, W)
        n_dev = 8

        def batch(seed):
            r = np.random.default_rng(seed)
            # uniform in [-1, 1]: rgb stays in uint8 range, so the uint8
            # checkpoint quantisation is the only resume loss (<1 LSB)
            rgb = jnp.asarray(r.uniform(-1, 1, (n_dev, H, W, 3)).astype(
                np.float32))
            depth = jnp.asarray(
                r.uniform(0.3, 1.2, (n_dev, H, W)).astype(np.float32))
            pose = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                    (n_dev, 4, 4))
            idx = jnp.asarray(sample_pixels(r, H, W, 16, 64, n_dev))
            return rgb, depth, pose, idx, jnp.ones((n_dev,), bool)

        mesh = make_mesh(n_dev)

        def make_fusion():
            return ShardedFusion(mesh, gs=GS, cs=CS, vh=VH, feat_dim=24,
                                 capacity=8192 * n_dev, calib_mat=calib,
                                 image_hw=(H, W), lseg_apply=model.apply,
                                 base_size=W, crop_size=W)

        # uninterrupted: two batches straight through
        f_all = make_fusion()
        f_all.step(params, *batch(10))
        f_all.step(params, *batch(11))
        fa, pa, wa, oa, ra = f_all.export()

        # killed after batch 1: export (= checkpoint), restore, continue
        f_half = make_fusion()
        f_half.step(params, *batch(10))
        ckpt = f_half.export()
        f_res = make_fusion()
        f_res.restore(*ckpt)
        f_res.step(params, *batch(11))
        fb, pb, wb, ob, rb = f_res.export()

        np.testing.assert_array_equal(oa >= 0, ob >= 0)
        ka, kb = np.lexsort(pa.T), np.lexsort(pb.T)
        np.testing.assert_array_equal(pa[ka], pb[kb])
        np.testing.assert_allclose(wa[ka], wb[kb], rtol=1e-5)
        np.testing.assert_allclose(fa[ka], fb[kb], rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(
            ra[ka].astype(np.int32), rb[kb].astype(np.int32), atol=1)


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__ as ge

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    ge.dryrun_multichip(8)


class TestShardedBuilderE2E:
    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_build_via_mesh(self, tmp_path, tiny_lseg):
        from avlmaps_tpu.parallel.sharded import make_mesh

        model, params = tiny_lseg
        scene = write_synthetic_scene(tmp_path / "scene", n_frames=4)
        cfg = load_config()
        cfg.map_config.grid_size = GS  # 64: divisible by 8 devices
        cfg.map_config.cell_size = CS
        cfg.map_config.pose_info.camera_height = CS * VH
        cfg.map_config.cam_calib_mat = tuple(
            get_sim_cam_mat(H, W).reshape(-1))
        cfg.map_config.capacity = 8192
        cfg.map_config.depth_sample_rate = 16
        cfg.map_config.max_pts_per_frame = 64
        cfg.map_config.max_depth = 6.0
        cfg.map_config.lseg_base_size = W
        cfg.map_config.lseg_crop_size = W

        base2cam = build_base2cam_tf(cfg.map_config.pose_info.base2cam_rot,
                                     cfg.map_config.pose_info.camera_height)
        base_tf = build_base_transform(
            cfg.map_config.pose_info.base_forward_axis,
            cfg.map_config.pose_info.base_left_axis,
            cfg.map_config.pose_info.base_up_axis)
        builder = VLMapBuilder(
            scene, cfg.map_config, scene / "poses.txt",
            sorted((scene / "rgb").glob("*.png")),
            sorted((scene / "depth").glob("*.npy")),
            base2cam, base_tf, lseg_apply=model.apply, lseg_params=params,
            feat_dim=24, batch_size=8, mesh=make_mesh(8))
        m = builder.create_mobile_base_map(save_every=0, progress=False)
        assert m.num_occupied > 0
        assert m.mapped_iters == set(range(4))
        assert (scene / "vlmap" / "vlmaps.h5df").exists()

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
    def test_sharded_builder_resume(self, tmp_path, tiny_lseg):
        """Build half the frames on the mesh path, then resume the rest:
        only unmapped frames are fused, the artifact ends complete."""
        from avlmaps_tpu.parallel.sharded import make_mesh

        model, params = tiny_lseg
        scene = write_synthetic_scene(tmp_path / "scene", n_frames=8)
        cfg = load_config()
        cfg.map_config.grid_size = GS
        cfg.map_config.cell_size = CS
        cfg.map_config.pose_info.camera_height = CS * VH
        cfg.map_config.cam_calib_mat = tuple(
            get_sim_cam_mat(H, W).reshape(-1))
        cfg.map_config.capacity = 8192
        cfg.map_config.depth_sample_rate = 16
        cfg.map_config.max_pts_per_frame = 64
        cfg.map_config.max_depth = 6.0
        cfg.map_config.lseg_base_size = W
        cfg.map_config.lseg_crop_size = W
        base2cam = build_base2cam_tf(cfg.map_config.pose_info.base2cam_rot,
                                     cfg.map_config.pose_info.camera_height)
        base_tf = build_base_transform(
            cfg.map_config.pose_info.base_forward_axis,
            cfg.map_config.pose_info.base_left_axis,
            cfg.map_config.pose_info.base_up_axis)
        rgbs = sorted((scene / "rgb").glob("*.png"))
        depths = sorted((scene / "depth").glob("*.npy"))

        def make_builder(n):
            return VLMapBuilder(
                scene, cfg.map_config, scene / "poses.txt", rgbs[:n],
                depths[:n], base2cam, base_tf, lseg_apply=model.apply,
                lseg_params=params, feat_dim=24, batch_size=8,
                mesh=make_mesh(8))

        m_half = make_builder(4).create_mobile_base_map(save_every=0,
                                                        progress=False)
        assert m_half.mapped_iters == set(range(4))
        m_full = make_builder(8).create_mobile_base_map(save_every=4,
                                                        progress=False)
        assert m_full.mapped_iters == set(range(8))
        assert m_full.num_occupied >= m_half.num_occupied
        # resumed map keeps the first half's mass: weights only grow
        assert m_full.weight.sum() > m_half.weight.sum()


class TestShardedQuery:
    def test_sharded_argmax_matches_single_device(self, rng):
        from avlmaps_tpu.parallel import make_mesh, sharded_score_argmax
        from avlmaps_tpu.ops.similarity import score_argmax
        import jax.numpy as jnp

        n, d, c = 4099, 64, 7  # deliberately not divisible by 8 devices
        feats = rng.normal(size=(n, d)).astype(np.float32)
        feats[100:140] = 0.0  # tie rows must agree across paths too
        text = rng.normal(size=(c, d)).astype(np.float32)
        mesh = make_mesh(8)
        got = sharded_score_argmax(mesh, feats, text)
        want = np.asarray(score_argmax(jnp.asarray(feats),
                                       jnp.asarray(text),
                                       normalize_map=True,
                                       normalize_text=True))
        np.testing.assert_array_equal(got, want)
