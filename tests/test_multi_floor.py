"""Multi-floor builder: bounds probe, global-pose fusion, schema round-trip."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from avlmaps_tpu.config import load_config
from avlmaps_tpu.geometry.projection import get_sim_cam_mat
from avlmaps_tpu.map.vlmap_builder_multi_floor import (
    VLMapBuilderMultiFloor, VLMapMultiFloor,
)
from avlmaps_tpu.models.lseg import LSegNet, LSegConfig

H, W = 32, 32


def write_scene(root: Path, n_frames: int = 4):
    import cv2

    rng = np.random.default_rng(0)
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    pose_tfs = []
    for i in range(n_frames):
        rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "rgb" / f"{i:06d}.png"), rgb[:, :, ::-1])
        np.save(root / "depth" / f"{i:06d}.npy",
                rng.uniform(0.3, 0.9, (H, W)).astype(np.float32))
        tf = np.eye(4)
        tf[1, 3] = 1.5 * (i // 2)  # two "floors"
        pose_tfs.append(tf)
    return root, pose_tfs


def test_multi_floor_build_and_load(tmp_path):
    scene, pose_tfs = write_scene(tmp_path / "scene")
    cfg = load_config()
    cfg.map_config.cell_size = 0.1
    cfg.map_config.cam_calib_mat = tuple(get_sim_cam_mat(H, W).reshape(-1))
    cfg.map_config.capacity = 8192
    cfg.map_config.depth_sample_rate = 16
    cfg.map_config.max_pts_per_frame = 64
    cfg.map_config.lseg_base_size = W
    cfg.map_config.lseg_crop_size = W

    model = LSegNet(LSegConfig.tiny16())
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, H, W, 3), jnp.float32))

    builder = VLMapBuilderMultiFloor(
        scene, cfg.map_config, sorted((scene / "rgb").glob("*.png")),
        sorted((scene / "depth").glob("*.npy")), pose_tfs,
        lseg_apply=model.apply, lseg_params=params, feat_dim=24,
        batch_size=2)

    pcd_min, pcd_max = builder.probe_bounds(sample_stride=4)
    assert (pcd_max - pcd_min > 0).all()
    # two floors 1.5 m apart must widen the vertical bounds
    assert pcd_max[1] - pcd_min[1] > 1.5

    grid_feat, grid_pos, weight, occupied, grid_rgb = \
        builder.create_global_map(progress=False)
    assert grid_feat.shape[0] > 0
    assert (weight > 0).all()

    m = VLMapMultiFloor(cfg.map_config)
    assert m.load_map(scene)
    assert m.grid_feat.shape == grid_feat.shape
    np.testing.assert_allclose(m.pcd_min, pcd_min)
    g = m.grid_to_global(m.grid_pos[:5])
    assert (g >= pcd_min - 1e-6).all()

    # open-vocabulary indexing API (reference vlmap_multi_floor.py:111-144)
    class FakeClip:
        def get_lseg_score(self, cats, feats, use_multiple_templates=True,
                           add_other=True):
            rng2 = np.random.default_rng(0)
            text = rng2.normal(size=(len(cats) + 1, feats.shape[1]))
            fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
            return (fn @ text.T).astype(np.float32)

    m.clip_encoder = FakeClip()
    scores = m.init_categories(["chair", "table"])
    assert scores.shape == (m.grid_feat.shape[0], 3)  # + 'other'
    mask = m.index_map("chair", with_init_cat=True)
    assert mask.shape == (m.grid_feat.shape[0],)
    assert mask.dtype == bool
    # uncategorised query path
    mask2 = m.index_map("sofa", with_init_cat=False)
    assert mask2.shape == mask.shape
    contours, centers, bboxes = m.get_pos("chair")
    assert isinstance(contours, list)


def test_missing_map_load(tmp_path):
    cfg = load_config()
    m = VLMapMultiFloor(cfg.map_config)
    assert not m.load_map(tmp_path)


def test_sharded_multi_floor_matches_single_device(tmp_path):
    """8-device CPU mesh multi-floor build == single-device build
    (VERDICT r2 next #5): same voxels, weights, features; and the sharded
    open-vocab indexing path agrees with the host argmax."""
    from avlmaps_tpu.parallel.sharded import make_mesh

    scene_a, pose_tfs = write_scene(tmp_path / "a", n_frames=8)
    scene_b, _ = write_scene(tmp_path / "b", n_frames=8)

    cfg = load_config()
    cfg.map_config.cell_size = 0.1
    cfg.map_config.cam_calib_mat = tuple(get_sim_cam_mat(H, W).reshape(-1))
    cfg.map_config.capacity = 8192
    cfg.map_config.depth_sample_rate = 16
    cfg.map_config.max_pts_per_frame = 64
    cfg.map_config.lseg_base_size = W
    cfg.map_config.lseg_crop_size = W

    model = LSegNet(LSegConfig.tiny16())
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, H, W, 3), jnp.float32))

    def build(scene, mesh):
        b = VLMapBuilderMultiFloor(
            scene, cfg.map_config, sorted((scene / "rgb").glob("*.png")),
            sorted((scene / "depth").glob("*.npy")), pose_tfs,
            lseg_apply=model.apply, lseg_params=params, feat_dim=24,
            batch_size=8, seed=3, mesh=mesh)
        return b.create_global_map(progress=False)

    mesh = make_mesh(8)
    f1, p1, w1, o1, r1 = build(scene_a, None)
    f8, p8, w8, o8, r8 = build(scene_b, mesh)

    # NOTE: the sharded grid pads gs to a mesh multiple; voxel coords are
    # identical because padding only extends the rows/cols range
    o1_occ = np.argwhere(o1 >= 0)
    o8_occ = np.argwhere(o8 >= 0)
    np.testing.assert_array_equal(
        o1_occ[np.lexsort(o1_occ.T)], o8_occ[np.lexsort(o8_occ.T)])

    k1 = np.lexsort(p1.T)
    k8 = np.lexsort(p8.T)
    np.testing.assert_array_equal(p1[k1], p8[k8])
    np.testing.assert_allclose(w1[k1], w8[k8], rtol=1e-5)
    # bf16 ICI payload: feature tolerance, not bitwise
    np.testing.assert_allclose(f1[k1], f8[k8], rtol=2e-2, atol=2e-2)

    # sharded open-vocab indexing parity (index_map_sharded)
    m = VLMapMultiFloor(cfg.map_config)
    assert m.load_map(scene_b)

    class FakeClip:
        feat_dim = 24

        def get_text_feats_multiple_templates(self, cats, batch_size=64):
            rng2 = np.random.default_rng(1)
            t = rng2.normal(size=(len(cats), 24)).astype(np.float32)
            return t / np.linalg.norm(t, axis=1, keepdims=True)

    m.clip_encoder = FakeClip()
    mask = m.index_map_sharded(mesh, "chair")
    text = m.clip_encoder.get_text_feats_multiple_templates(
        ["chair", "other"])
    fn = m.grid_feat / np.maximum(
        np.linalg.norm(m.grid_feat, axis=1, keepdims=True), 1e-12)
    expect = (fn @ text.T).argmax(axis=1) == 0
    np.testing.assert_array_equal(mask, expect)


def test_multi_floor_packed_matches_decoded(tmp_path):
    """A matching f32 .avpack feeds the multi-floor build bit-identically
    to PNG/npy decode (pipeline/packed.py; seeded sampler)."""
    from avlmaps_tpu.pipeline.packed import pack_scene

    def build(root, pose_tfs):
        cfg = load_config()
        cfg.map_config.cell_size = 0.1
        cfg.map_config.cam_calib_mat = tuple(
            get_sim_cam_mat(H, W).reshape(-1))
        cfg.map_config.capacity = 8192
        cfg.map_config.depth_sample_rate = 16
        cfg.map_config.max_pts_per_frame = 64
        cfg.map_config.lseg_base_size = W
        cfg.map_config.lseg_crop_size = W
        model = LSegNet(LSegConfig.tiny16())
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, H, W, 3), jnp.float32))
        b = VLMapBuilderMultiFloor(
            root, cfg.map_config, sorted((root / "rgb").glob("*.png")),
            sorted((root / "depth").glob("*.npy")), pose_tfs,
            lseg_apply=model.apply, lseg_params=params, feat_dim=24,
            batch_size=2)
        b.probe_bounds(sample_stride=4)
        return b.create_global_map(progress=False)

    s1, poses1 = write_scene(tmp_path / "plain")
    s2, poses2 = write_scene(tmp_path / "packed")
    pack_scene(sorted((s2 / "rgb").glob("*.png")),
               sorted((s2 / "depth").glob("*.npy")),
               s2 / "scene.avpack", depth_dtype="f32")
    feat1, pos1, w1, occ1, rgb1 = build(s1, poses1)
    feat2, pos2, w2, occ2, rgb2 = build(s2, poses2)
    np.testing.assert_array_equal(pos2, pos1)
    np.testing.assert_array_equal(occ2, occ1)
    np.testing.assert_allclose(w2, w1, rtol=1e-6)
    np.testing.assert_allclose(feat2, feat1, rtol=1e-5, atol=1e-6)
