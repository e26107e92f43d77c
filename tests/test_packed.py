"""Packed-scene ingestion (pipeline/packed.py): format round-trip, loader
bit-parity with the PNG/npy path, and builder integration.

The pack replaces the reference's per-build PNG/npy decode
(avlmaps/map/vlmap_builder.py:118-120) with a one-time conversion; these
tests pin that a packed build is indistinguishable from a decoded one."""

from pathlib import Path

import numpy as np
import pytest

from avlmaps_tpu.pipeline.loader import PrefetchLoader
from avlmaps_tpu.pipeline.packed import (PackedLoader, PackedScene,
                                         pack_scene)
from avlmaps_tpu.pipeline.transport import (make_canvas_transform,
                                            resize_canvas_u8)

from tests.test_builder import H, W, write_synthetic_scene

CANVAS_HW = (24, 24)


@pytest.fixture()
def scene_dir(tmp_path) -> Path:
    return write_synthetic_scene(tmp_path / "scene", n_frames=5)


@pytest.fixture(scope="module")
def tiny_lseg():
    import jax
    import jax.numpy as jnp

    from avlmaps_tpu.models.lseg import LSegConfig, LSegNet

    cfg = LSegConfig.tiny16()
    model = LSegNet(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, H, W, 3), jnp.float32))
    return model, params


def _paths(root: Path):
    return (sorted((root / "rgb").glob("*.png")),
            sorted((root / "depth").glob("*.npy")))


def _poses(n):
    return [np.eye(4, dtype=np.float32) + 0.01 * i for i in range(n)]


class TestPackFormat:
    def test_roundtrip(self, scene_dir):
        rgb_paths, depth_paths = _paths(scene_dir)
        out = pack_scene(rgb_paths, depth_paths,
                         scene_dir / "scene.avpack", canvas_hw=CANVAS_HW)
        sc = PackedScene(out)
        assert (sc.n, sc.h, sc.w) == (5, H, W)
        assert sc.canvas_hw == CANVAS_HW
        assert sc.matches(rgb_paths)
        from avlmaps_tpu.pipeline.loader import load_depth, load_rgb

        for i in (0, 4):
            np.testing.assert_array_equal(sc.rgb[i], load_rgb(rgb_paths[i]))
            d = np.asarray(load_depth(depth_paths[i]))
            np.testing.assert_array_equal(
                sc.depth[i],
                np.clip(d * 1000.0, 0, 65535).astype(np.uint16))
            # uint16-mm truncation (matches loader depth_mm): <= 1 mm
            np.testing.assert_allclose(sc.depth_metres(i), d, atol=1.01e-3)
            np.testing.assert_array_equal(
                sc.canvas[i], resize_canvas_u8(load_rgb(rgb_paths[i]),
                                               *CANVAS_HW))

    def test_depth_f32(self, scene_dir):
        rgb_paths, depth_paths = _paths(scene_dir)
        out = pack_scene(rgb_paths, depth_paths, scene_dir / "f32.avpack",
                         depth_dtype="f32")
        sc = PackedScene(out)
        assert sc.canvas is None
        from avlmaps_tpu.pipeline.loader import load_depth

        np.testing.assert_array_equal(sc.depth[2],
                                      np.asarray(load_depth(depth_paths[2])))
        np.testing.assert_array_equal(sc.depth_metres(2), sc.depth[2])

    def test_stale_guard(self, scene_dir):
        rgb_paths, depth_paths = _paths(scene_dir)
        out = pack_scene(rgb_paths, depth_paths, scene_dir / "scene.avpack")
        sc = PackedScene(out)
        assert not sc.matches(rgb_paths[:-1])
        assert not sc.matches(list(reversed(rgb_paths)))

    def test_open_matching_rejects_outdated_pack(self, scene_dir):
        """Re-rendering a scene in place (same file names, new imagery)
        must invalidate an older pack: matches() passes on names alone,
        so open_matching also compares mtimes (review r3)."""
        import os
        import time

        from avlmaps_tpu.pipeline.packed import open_matching

        rgb_paths, depth_paths = _paths(scene_dir)
        out = pack_scene(rgb_paths, depth_paths, scene_dir / "scene.avpack")
        assert open_matching(scene_dir, rgb_paths, depth_paths) is not None
        # "re-render" one source frame after the pack was written
        future = time.time() + 10
        os.utime(rgb_paths[0], (future, future))
        assert open_matching(scene_dir, rgb_paths, depth_paths) is None
        with pytest.raises(ValueError, match="older than its source"):
            open_matching(scene_dir, rgb_paths, depth_paths,
                          explicit_path=out)

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "junk.avpack"
        p.write_bytes(b"NOTAPACK" + b"\0" * 64)
        with pytest.raises(ValueError, match="not an avpack"):
            PackedScene(p)


class TestPackedLoader:
    def test_frame_mode_matches_png_loader(self, scene_dir):
        rgb_paths, depth_paths = _paths(scene_dir)
        out = pack_scene(rgb_paths, depth_paths, scene_dir / "scene.avpack")
        poses = _poses(5)
        ref = list(PrefetchLoader(rgb_paths, depth_paths, poses,
                                  batch_size=2, normalize=False,
                                  depth_mm=True))
        got = list(PackedLoader(PackedScene(out), poses, batch_size=2))
        assert len(got) == len(ref) == 3
        for rb, gb in zip(ref, got):
            np.testing.assert_array_equal(gb.frame_ids, rb.frame_ids)
            np.testing.assert_array_equal(gb.rgb, rb.rgb)
            np.testing.assert_array_equal(gb.depth, rb.depth)
            np.testing.assert_array_equal(gb.pose_tf, rb.pose_tf)
        # padding of the last batch marked invalid
        assert got[-1].frame_ids[-1] == -1

    def test_canvas_mode_bit_identical(self, scene_dir):
        """Packed canvas batches == online canvas-transport batches."""
        rgb_paths, depth_paths = _paths(scene_dir)
        out = pack_scene(rgb_paths, depth_paths, scene_dir / "scene.avpack",
                         canvas_hw=CANVAS_HW)
        poses = _poses(5)

        def sampler(seed):
            rng = np.random.default_rng(seed)
            return lambda b: rng.integers(0, H * W, (b, 16)).astype(np.int64)

        ref = list(PrefetchLoader(
            rgb_paths, depth_paths, poses, batch_size=2, normalize=False,
            transform=make_canvas_transform(sampler(7), CANVAS_HW)))
        got = list(PackedLoader(PackedScene(out), poses, batch_size=2,
                                sampler=sampler(7)))
        assert len(got) == len(ref) == 3
        for rb, gb in zip(ref, got):
            np.testing.assert_array_equal(gb.frame_ids, rb.frame_ids)
            np.testing.assert_array_equal(gb.canvas, rb.canvas)
            np.testing.assert_array_equal(gb.z_mm, rb.z_mm)
            np.testing.assert_array_equal(gb.rgb_pts, rb.rgb_pts)
            np.testing.assert_array_equal(gb.sample_idx, rb.sample_idx)
            np.testing.assert_array_equal(gb.pose_tf, rb.pose_tf)

    def test_skip_ids(self, scene_dir):
        rgb_paths, depth_paths = _paths(scene_dir)
        out = pack_scene(rgb_paths, depth_paths, scene_dir / "scene.avpack")
        batches = list(PackedLoader(PackedScene(out), _poses(5),
                                    batch_size=2, skip_ids={0, 2}))
        seen = [int(i) for b in batches for i in b.frame_ids if i >= 0]
        assert seen == [1, 3, 4]

    def test_canvas_mode_requires_canvas(self, scene_dir):
        rgb_paths, depth_paths = _paths(scene_dir)
        out = pack_scene(rgb_paths, depth_paths, scene_dir / "nc.avpack")
        with pytest.raises(ValueError, match="canvas"):
            PackedLoader(PackedScene(out), _poses(5), sampler=lambda b: None)


class TestBuilderIntegration:
    def _build(self, scene, tiny_lseg, **kw):
        import jax  # noqa: F401

        from avlmaps_tpu.config import load_config
        from avlmaps_tpu.geometry.projection import get_sim_cam_mat
        from avlmaps_tpu.geometry.transforms import (build_base2cam_tf,
                                                     build_base_transform)
        from avlmaps_tpu.map.vlmap_builder import VLMapBuilder
        from tests.test_builder import CS, GS, VH

        model, params = tiny_lseg
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
        builder = VLMapBuilder(
            scene, cfg.map_config, scene / "poses.txt",
            sorted((scene / "rgb").glob("*.png")),
            sorted((scene / "depth").glob("*.npy")),
            base2cam, base_tf, lseg_apply=model.apply, lseg_params=params,
            feat_dim=24, batch_size=2, **kw)
        return builder.create_mobile_base_map(save_every=0, progress=False)

    def test_auto_detected_pack_matches_png_build(self, tmp_path, tiny_lseg):
        """Same scene, same seed: packed build == decoded build exactly."""
        from avlmaps_tpu.models.lseg.window import plan_windows

        png_scene = write_synthetic_scene(tmp_path / "png", n_frames=4)
        pk_scene = write_synthetic_scene(tmp_path / "packed", n_frames=4)
        ch, cw, _, _, _ = plan_windows(H, W, 520, 480)
        pack_scene(*_paths(pk_scene), pk_scene / "scene.avpack",
                   canvas_hw=(ch, cw))

        m_png = self._build(png_scene, tiny_lseg)
        m_pack = self._build(pk_scene, tiny_lseg)
        np.testing.assert_array_equal(m_pack.grid_pos, m_png.grid_pos)
        np.testing.assert_array_equal(m_pack.occupied_ids,
                                      m_png.occupied_ids)
        np.testing.assert_allclose(m_pack.weight, m_png.weight, rtol=1e-6)
        np.testing.assert_allclose(m_pack.grid_feat, m_png.grid_feat,
                                   rtol=1e-5, atol=1e-6)

    def test_stale_pack_falls_back(self, tmp_path, tiny_lseg, capsys):
        scene = write_synthetic_scene(tmp_path / "scene", n_frames=4)
        rgb, dep = _paths(scene)
        pack_scene(rgb[:2], dep[:2], scene / "scene.avpack")  # wrong list
        m = self._build(scene, tiny_lseg)
        assert m.mapped_iters == set(range(4))  # built all frames anyway
        assert "stale pack" in capsys.readouterr().out

    def test_explicit_missing_pack_raises(self, tmp_path, tiny_lseg):
        scene = write_synthetic_scene(tmp_path / "scene", n_frames=2)
        with pytest.raises(FileNotFoundError):
            self._build(scene, tiny_lseg,
                        packed_path=scene / "nosuch.avpack")


def test_pack_scene_cli(tmp_path, capsys):
    from tools.pack_scene import main

    scene = write_synthetic_scene(tmp_path / "scene", n_frames=3)
    assert main([str(scene)]) == 0
    out = scene / "scene.avpack"
    assert out.exists()
    sc = PackedScene(out)
    assert sc.n == 3 and sc.canvas is not None
    assert "packed 3 frames" in capsys.readouterr().out
