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
