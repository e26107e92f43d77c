"""LLM glue (with a stubbed backend), category matching fallbacks, and the
interactive-map headless core."""

import numpy as np
import pytest

from avlmaps_tpu.utils import llm
from avlmaps_tpu.utils.category_matching import find_similar_category_id


class TestLLMGlue:
    def setup_method(self):
        self._saved = llm.complete_fn

    def teardown_method(self):
        llm.complete_fn = self._saved

    def test_landmark_parsing(self):
        llm.complete_fn = lambda prompt: " kitchen, toilet\n"
        out = llm.parse_object_goal_instruction(
            "go to the kitchen and then the toilet")
        assert out == ["kitchen", "toilet"]

    def test_codegen(self):
        llm.complete_fn = lambda prompt: "robot.move_to_object('chair')\n"
        code = llm.parse_spatial_instruction("find any chairs")
        assert "robot.move_to_object" in code

    def test_similar_category(self):
        llm.complete_fn = lambda prompt: "tv_monitor"
        assert llm.parse_similar_category(
            "television", ["tv_monitor", "chair"]) == "tv_monitor"

    def test_no_backend_raises(self, monkeypatch):
        llm.complete_fn = None
        monkeypatch.delenv("OPENAI_KEY", raising=False)
        monkeypatch.delenv("OPENAI_API_KEY", raising=False)
        with pytest.raises(RuntimeError):
            llm.parse_object_goal_instruction("go somewhere")


class TestCategoryMatching:
    def test_exact(self):
        assert find_similar_category_id("chair", ["table", "chair"]) == 1

    def test_fuzzy_offline(self, monkeypatch):
        monkeypatch.delenv("OPENAI_KEY", raising=False)
        monkeypatch.delenv("OPENAI_API_KEY", raising=False)
        # no LLM -> difflib fallback picks the closest name
        assert find_similar_category_id(
            "chairs", ["table", "chair", "sofa"]) == 1

    def test_injected_resolver(self):
        from avlmaps_tpu.utils import category_matching as cm

        cm.llm_resolver = lambda name, cats: "tv_monitor"
        try:
            assert find_similar_category_id(
                "television", ["plant", "tv_monitor"]) == 1
        finally:
            cm.llm_resolver = None


class TestInteractiveMapCore:
    @pytest.fixture(scope="class")
    def imap(self, tmp_path_factory):
        from avlmaps_tpu.map.interactive_map import InteractiveMap
        from avlmaps_tpu.config import load_config
        from tests.test_nav_robot import make_scene, GS, CS, VH

        scene = make_scene(tmp_path_factory.mktemp("imap") / "scene",
                           np.random.default_rng(0))
        cfg = load_config()
        cfg.map_config.grid_size = GS
        cfg.map_config.cell_size = CS
        cfg.map_config.pose_info.camera_height = CS * VH
        return InteractiveMap(scene, cfg.map_config)

    def test_click_to_habitat_state(self, imap):
        tf = imap.get_habitat_robot_state((10.0, 10.0), (5.0, 10.0))
        assert tf.shape == (4, 4)
        # round-trip: the tf should land back near the picked cell
        imap.vlmaps_dataloader.from_habitat_tf(tf)
        row, col, deg = imap.vlmaps_dataloader.to_cropped_map_pose()
        assert abs(row - 10) <= 1 and abs(col - 10) <= 1
        # facing "up" (toward decreasing row) => heading ~0
        assert abs(deg) < 10

    def test_draw_overlays(self, imap):
        canvas = np.zeros((40, 40, 3), np.uint8)
        out = imap.draw_path(canvas, [(5, 5), (20, 20), (30, 10)])
        assert out.sum() > 0
        out2 = imap.draw_boxes(canvas, [(2, 10, 3, 12)])
        assert out2.sum() > 0

    def test_play_actions(self, imap):
        from avlmaps_tpu.robot.sim import KinematicSimulator

        sim = KinematicSimulator(0.1, 5.0)
        imap.vlmaps_dataloader.from_cropped_map_pose(10, 10, 0.0)
        init = imap.vlmaps_dataloader.to_habitat_tf()
        visited = imap.play_actions(sim, init, ["move_forward"] * 5)
        assert len(visited) == 5
        # moved up the map (decreasing row)
        assert visited[-1][0] < 10


class TestVisualize3D:
    """3D heatmap visualisation fallbacks (reference opens Open3D windows,
    visualize_utils.py:68-75; headless hosts render PNG / write .ply)."""

    def _cloud(self):
        rng = np.random.default_rng(0)
        pc = rng.uniform(0, 10, (500, 3)).astype(np.float32)
        rgb = rng.integers(0, 255, (500, 3)).astype(np.uint8)
        heat = rng.uniform(0, 1, 500).astype(np.float32)
        return pc, rgb, heat

    def test_png_render(self, tmp_path):
        from avlmaps_tpu.utils.visualize import visualize_heatmap_3d

        pc, rgb, heat = self._cloud()
        out = visualize_heatmap_3d(pc, heat, rgb,
                                   save_path=tmp_path / "h.png")
        assert out is not None and out.exists()
        assert out.stat().st_size > 1000

    def test_ply_dump_roundtrip(self, tmp_path):
        from avlmaps_tpu.utils.visualize import (
            visualize_rgb_map_3d, write_ply)

        pc, rgb, _ = self._cloud()
        out = visualize_rgb_map_3d(pc, rgb, save_path=tmp_path / "m.ply")
        assert out is not None and out.exists()
        header = out.read_text().splitlines()
        assert header[0] == "ply"
        assert f"element vertex {pc.shape[0]}" in header[2]
        assert len(header) == 10 + pc.shape[0]
        del write_ply  # imported for API presence

    def test_jet_blend_matches_facade(self):
        """convert_heatmap_to_rgb must equal AVLMap.heatmap_rgb's blend."""
        import cv2

        from avlmaps_tpu.utils.visualize import convert_heatmap_to_rgb

        pc, rgb, heat = self._cloud()
        got = convert_heatmap_to_rgb(heat, rgb, 0.5)
        sim = (heat * 255).astype(np.uint8)
        jet = cv2.applyColorMap(sim, cv2.COLORMAP_JET)
        want = jet.reshape(-1, 3)[:, ::-1].astype(np.float32) * 0.5 \
            + rgb * 0.5
        np.testing.assert_allclose(got, want, atol=1e-4)
