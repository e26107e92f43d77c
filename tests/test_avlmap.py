"""Full AVLMap integration test on a synthetic scene with tiny encoders:
create all four modality maps, reload, and query every modality
(SURVEY.md §4c small synthetic-scene integration tests)."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avlmaps_tpu.config import load_config
from avlmaps_tpu.geometry.projection import get_sim_cam_mat
from avlmaps_tpu.map.avlmap import AVLMap
from avlmaps_tpu.models.clip import ClipEncoder, ClipConfig
from avlmaps_tpu.models.lseg import LSegNet, LSegConfig
from avlmaps_tpu.models.audioclip import AudioClipConfig, AudioClipEncoder
from avlmaps_tpu.utils.audio import write_wav

H, W = 32, 32
GS, CS, VH = 64, 0.1, 8

TINY_CLIP = ClipConfig(embed_dim=24, image_size=32, patch_size=8,
                       vision_width=32, vision_layers=2, text_width=32,
                       text_layers=2, text_heads=2, context_length=16)


def write_scene(root: Path, n_frames: int = 4, sr: int = 8000):
    import cv2

    rng = np.random.default_rng(0)
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    poses = []
    for i in range(n_frames):
        rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "rgb" / f"{i:06d}.png"), rgb[:, :, ::-1])
        np.save(root / "depth" / f"{i:06d}.npy",
                rng.uniform(0.3, 0.7, (H, W)).astype(np.float32))
        poses.append([0.05 * i, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    np.savetxt(root / "poses.txt", np.asarray(poses))

    # one audio-video sequence: a wav with two beeps + a pose track
    seq = root / "audio_video" / "000000"
    seq.mkdir(parents=True)
    t = np.arange(4 * sr) / sr
    audio = np.zeros(4 * sr, np.float32)
    audio[:sr // 2] = 0.4 * np.sin(2 * np.pi * 600 * t[:sr // 2])
    audio[2 * sr:2 * sr + sr // 2] = 0.4 * np.sin(
        2 * np.pi * 200 * t[:sr // 2])
    write_wav(seq / "audio.wav", audio, sr)
    seq_poses = [[0.05 * i, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]
                 for i in range(4 * 25)]
    np.savetxt(seq / "poses.txt", np.asarray(seq_poses))
    return root


@pytest.fixture(scope="module")
def avlmap(tmp_path_factory):
    scene = write_scene(tmp_path_factory.mktemp("scene") / "s")

    cfg = load_config()
    cfg.map_config.grid_size = GS
    cfg.map_config.cell_size = CS
    cfg.params.gs = GS
    cfg.params.cs = CS
    cfg.map_config.pose_info.camera_height = CS * VH
    cfg.map_config.cam_calib_mat = tuple(get_sim_cam_mat(H, W).reshape(-1))
    cfg.map_config.capacity = 8192
    cfg.map_config.depth_sample_rate = 8
    cfg.map_config.max_pts_per_frame = 128
    cfg.map_config.lseg_base_size = W
    cfg.map_config.lseg_crop_size = W
    cfg.sound_data_collect_params.sample_rate = 8000
    cfg.sound_data_collect_params.fps = 25

    clip_enc = ClipEncoder.from_config(TINY_CLIP)
    audio_enc = AudioClipEncoder(AudioClipConfig.tiny())

    m = AVLMap(cfg, data_dir=str(scene), clip_encoder=clip_enc,
               area_clip_encoder=clip_enc, audioclip_encoder=audio_enc)
    lseg = LSegNet(LSegConfig.tiny16())
    lseg_params = jax.jit(lseg.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, H, W, 3), jnp.float32))
    m.vlmap.set_lseg(lseg.apply, lseg_params, feat_dim=24)
    m.create_map(scene)
    m.load_map(scene)
    return m


class TestAVLMapIntegration:
    def test_artifacts_on_disk(self, avlmap):
        d = Path(avlmap.vlmap.data_dir)
        assert (d / "vlmap" / "vlmaps.h5df").exists()
        assert (d / "area_map" / "clip_sparse_map.h5df").exists()
        assert list((d / "visual_map").glob("global_descriptors*.h5df"))
        assert (d / "audio_video"
                / "audio_data_level_3.pkl").exists()

    def test_index_object(self, avlmap):
        # reference semantics: init_categories is an mp3dcat-style list whose
        # first/last entries ('void'/'objects') are stripped (avlmap.py:69)
        heat = avlmap.index_object(
            "chair", init_categories=["void", "chair", "table", "objects"])
        n = avlmap.vlmap.grid_feat.shape[0]
        assert heat.shape == (n,)
        assert heat.min() >= 0 and heat.max() <= 1

    def test_serving_query_matches_index_map(self, avlmap):
        """VLMap.make_serving_query (one-dispatch text->goal program) must
        agree with the staged index_map + heatmap path on the real map."""
        from avlmaps_tpu.ops.delivery import fetch_np
        from avlmaps_tpu.ops.heatmap import heatmap_from_mask_3d

        vm = avlmap.vlmap
        query = vm.make_serving_query(k=8)
        out = query("chair")
        heat, goal = fetch_np(out["heat"], out["goal_pos"])

        mask = vm.index_map("chair", with_init_cat=False)
        ref = heatmap_from_mask_3d(vm.grid_pos, mask, cell_size=vm.cs,
                                   decay_rate=0.01, method="dense",
                                   lattice_unit=1.0,
                                   grid_shape=vm.occupied_ids.shape)
        np.testing.assert_allclose(heat, ref, atol=1e-5)
        np.testing.assert_array_equal(goal,
                                      vm.grid_pos[int(np.argmax(ref))])

    def test_index_area(self, avlmap):
        heat2d = avlmap.index_area_2d("kitchen")
        assert heat2d.shape == (GS, GS)
        assert heat2d.max() <= 1.0 + 1e-6
        heat3d = avlmap.index_area("kitchen")
        assert heat3d.shape == (avlmap.vlmap.grid_pos.shape[0],)

    def test_index_sound(self, avlmap):
        # two beep events were embedded in the wav
        assert len(avlmap.sound_map.audio_database) == 2
        heat2d = avlmap.index_sound_2d("glass_breaking")
        assert heat2d.shape == (GS, GS)
        heat3d = avlmap.index_sound("glass_breaking")
        assert heat3d.shape == (avlmap.vlmap.grid_pos.shape[0],)
        assert np.isfinite(heat3d).all()

    def test_index_image(self, avlmap):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        heat = avlmap.index_image(img)
        assert heat.shape == (avlmap.vlmap.grid_pos.shape[0],)
        assert heat.min() >= 0 and heat.max() <= 1

    def test_sound_get_pos(self, avlmap):
        locs = avlmap.sound_map.get_pos("dog")
        assert len(locs) > 0

    def test_fused_heatmaps_compose(self, avlmap):
        """Cross-modal fusion: elementwise product of modality heatmaps
        (reference habitat_lang_robot.py:377-430 fusion policy)."""
        obj = avlmap.index_object(
            "chair", init_categories=["void", "chair", "table", "objects"])
        area = avlmap.index_area("kitchen")
        fused = obj * area
        assert fused.shape == obj.shape
        assert np.isfinite(fused).all()
