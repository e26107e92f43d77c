"""VisualMap metric refinement: ORB + depth-lifted PnP recovers a known
camera translation on a synthetic textured scene."""

from pathlib import Path

import numpy as np
import pytest

from avlmaps_tpu.config import load_config
from avlmaps_tpu.geometry.projection import get_sim_cam_mat
from avlmaps_tpu.map.visual_map import VisualMap

H, W = 240, 320
DEPTH = 2.0
TX = 0.25  # query camera moved +x by 25 cm


def textured_canvas(rng, h, w):
    import cv2

    canvas = np.full((h, w, 3), 30, np.uint8)
    for _ in range(400):
        x, y = int(rng.integers(0, w - 8)), int(rng.integers(0, h - 8))
        sz = int(rng.integers(3, 9))
        color = tuple(int(c) for c in rng.integers(40, 255, 3))
        cv2.rectangle(canvas, (x, y), (x + sz, y + sz), color, -1)
    return canvas


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    import cv2

    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("vmap") / "scene"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()

    fx = get_sim_cam_mat(H, W)[0, 0]
    shift = int(round(fx * TX / DEPTH))
    tex = textured_canvas(rng, H, W + shift)
    ref = tex[:, :W]
    query = tex[:, shift:W + shift]  # camera moved +x -> content shifts left

    cv2.imwrite(str(root / "rgb" / "000000.png"), ref[:, :, ::-1])
    np.save(root / "depth" / "000000.npy",
            np.full((H, W), DEPTH, np.float32))
    np.savetxt(root / "poses.txt",
               np.asarray([[0, 0, 0, 0, 0, 0, 1.0]]))
    return root, query


@pytest.fixture(scope="module")
def vmap(scene):
    root, _ = scene
    cfg = load_config()
    cfg.map_config.cam_calib_mat = tuple(get_sim_cam_mat(H, W).reshape(-1))
    from avlmaps_tpu.geometry.transforms import pose_vec_to_tf

    m = VisualMap(cfg.map_config, str(root))
    m.data_dir = Path(root)
    m.poses = np.stack([pose_vec_to_tf([0, 0, 0, 0, 0, 0, 1.0])])
    m.descriptors = np.ones((1, 8), np.float32)  # retrieval trivially -> 0
    return m


def test_refine_recovers_translation(scene, vmap):
    _, query = scene
    cam_tf = vmap.refine_pose(query, 0, get_sim_cam_mat(H, W))
    assert cam_tf is not None, "PnP refinement failed to find a pose"
    # expected: ref cam pose (origin + camera height on y) shifted +x by TX
    expected = vmap._ref_cam_tf(0)
    delta = cam_tf[:3, 3] - expected[:3, 3]
    np.testing.assert_allclose(delta, [TX, 0, 0], atol=0.06)
    # rotation stays ~identity
    np.testing.assert_allclose(cam_tf[:3, :3], expected[:3, :3], atol=0.05)


def test_refine_fails_gracefully_on_textureless(vmap):
    blank = np.zeros((H, W, 3), np.uint8)
    assert vmap.refine_pose(blank, 0, get_sim_cam_mat(H, W)) is None


def test_superpoint_refine_recovers_translation(scene):
    """The SuperPoint + MNN path through refine_pose: identical texture
    patches give matching descriptors even under random conv weights, so
    the full learned-feature pipeline (extract -> device MNN -> depth-lifted
    PnP) must recover the known translation too (VERDICT item 3)."""
    from avlmaps_tpu.models.superpoint import (
        SuperPointConfig, SuperPointExtractor)

    root, query = scene
    cfg = load_config()
    cfg.map_config.cam_calib_mat = tuple(get_sim_cam_mat(H, W).reshape(-1))
    from avlmaps_tpu.geometry.transforms import pose_vec_to_tf

    sp = SuperPointExtractor(SuperPointConfig(
        channels=(8, 8, 16, 16), det_ch=32, desc_ch=32, desc_dim=32,
        max_keypoints=512, score_threshold=0.0))
    m = VisualMap(cfg.map_config, str(root), superpoint=sp)
    m.data_dir = Path(root)
    m.poses = np.stack([pose_vec_to_tf([0, 0, 0, 0, 0, 0, 1.0])])
    m.descriptors = np.ones((1, 8), np.float32)

    cam_tf = m.refine_pose(query, 0, get_sim_cam_mat(H, W))
    assert cam_tf is not None, "SuperPoint PnP refinement failed"
    expected = m._ref_cam_tf(0)
    delta = cam_tf[:3, 3] - expected[:3, 3]
    np.testing.assert_allclose(delta, [TX, 0, 0], atol=0.06)
    np.testing.assert_allclose(cam_tf[:3, :3], expected[:3, :3], atol=0.05)


def test_localize_image_uses_refinement(scene, vmap):
    _, query = scene

    # stub the (CLIP) retrieval so no encoder is needed
    vmap.retrieve = lambda img, topk=1: np.array([0])
    cam_tf, base_tf = vmap.localize_image(query)
    assert abs(cam_tf[0, 3] - TX) < 0.06
    np.testing.assert_allclose(
        base_tf[1, 3],
        cam_tf[1, 3] - vmap.map_config.pose_info.camera_height)


def test_superglue_refine_recovers_translation(scene):
    """SuperPoint + SuperGlue path through refine_pose.  An untrained tiny
    SuperGlue is a poor matcher, so the test injects a matcher whose
    decision comes out of the real SuperGlue decision rule applied to a
    descriptor-similarity assignment — this exercises the full wiring
    (feature dicts, hw plumbing, index selection) with a matcher of
    SuperGlue's interface."""
    import jax.numpy as jnp

    from avlmaps_tpu.models.superpoint import (
        SuperPointConfig, SuperPointExtractor)
    from avlmaps_tpu.models.superglue import (
        log_optimal_transport, match_from_assignment)
    from avlmaps_tpu.geometry.transforms import pose_vec_to_tf

    class SimilaritySuperGlue:
        """SuperGlueMatcher-interface stub: unary descriptor similarity
        through the real Sinkhorn + mutual-max decision."""

        def match(self, f0, f1, hw, hw1=None):
            assert len(hw) == 2 and (hw1 is None or len(hw1) == 2)
            d0 = jnp.asarray(f0["descriptors"])
            d1 = jnp.asarray(f1["descriptors"])
            v0 = jnp.asarray(f0["valid"])
            v1 = jnp.asarray(f1["valid"])
            # sharp temperature: untrained SuperPoint descriptors have
            # weak margins, and this stub has no learned calibration
            scores = 100.0 * jnp.einsum("bnd,bmd->bnm", d0, d1)
            Z = log_optimal_transport(scores, jnp.asarray(1.0), v0, v1,
                                      iters=20)
            return match_from_assignment(Z, v0, v1, threshold=0.05)

    root, query = scene
    cfg = load_config()
    cfg.map_config.cam_calib_mat = tuple(get_sim_cam_mat(H, W).reshape(-1))
    sp = SuperPointExtractor(SuperPointConfig(
        channels=(8, 8, 16, 16), det_ch=32, desc_ch=32, desc_dim=32,
        max_keypoints=512, score_threshold=0.0))
    m = VisualMap(cfg.map_config, str(root), superpoint=sp,
                  superglue=SimilaritySuperGlue())
    m.data_dir = Path(root)
    m.poses = np.stack([pose_vec_to_tf([0, 0, 0, 0, 0, 0, 1.0])])
    m.descriptors = np.ones((1, 8), np.float32)

    cam_tf = m.refine_pose(query, 0, get_sim_cam_mat(H, W))
    assert cam_tf is not None, "SuperGlue-path PnP refinement failed"
    expected = m._ref_cam_tf(0)
    delta = cam_tf[:3, 3] - expected[:3, 3]
    np.testing.assert_allclose(delta, [TX, 0, 0], atol=0.06)
    np.testing.assert_allclose(cam_tf[:3, :3], expected[:3, :3], atol=0.05)


def test_encoder_switch_preserves_other_cache(scene, tmp_path):
    """Switching retrieval encoders must not destroy another encoder's
    descriptor cache (ADVICE r2): caches are per-dim files."""
    import shutil

    root, query = scene
    work = tmp_path / "scene"
    shutil.copytree(root, work)

    class FakeEnc:
        def __init__(self, dim):
            self.feat_dim = dim

        def get_imgs_feats_batch(self, imgs, bs):
            return np.full((len(imgs), self.feat_dim), 1.0, np.float32)

        def get_img_feats(self, img):
            return np.full((1, self.feat_dim), 1.0, np.float32)

    cfg = load_config()
    m_a = VisualMap(cfg.map_config, clip_encoder=FakeEnc(16))
    m_a.create_and_load_map(work)
    cache_a = work / "visual_map" / "global_descriptors_16.h5df"
    assert cache_a.exists()
    before = cache_a.read_bytes()

    # second encoder with a different dim: builds its own cache file
    m_b = VisualMap(cfg.map_config, clip_encoder=FakeEnc(32))
    m_b.create_and_load_map(work)
    assert (work / "visual_map" / "global_descriptors_32.h5df").exists()
    assert cache_a.read_bytes() == before  # untouched

    # retrieve() with mismatched in-memory descriptors recomputes for the
    # active encoder without unlinking anything
    m_b.descriptors = np.ones((1, 16), np.float32)
    m_b.retrieve(np.zeros((8, 8, 3), np.uint8))
    assert m_b.descriptors.shape[1] == 32
    assert cache_a.read_bytes() == before
