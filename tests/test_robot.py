"""HabitatLanguageRobot integration with the kinematic simulator: scene
setup, move_to through plan->actions->sim, language primitives, LLM-code
execution (the reference's robot smoke test, habitat_lang_robot.py:633-664,
without needing habitat)."""


import numpy as np
import pytest

from avlmaps_tpu.config import load_config
from avlmaps_tpu.models.clip import ClipEncoder, ClipConfig
from avlmaps_tpu.robot import HabitatLanguageRobot, KinematicSimulator
from tests.test_nav_robot import make_scene, GS, CS, VH

TINY_CLIP = ClipConfig(embed_dim=8, image_size=32, patch_size=8,
                       vision_width=32, vision_layers=2, text_width=32,
                       text_layers=2, text_heads=2, context_length=16)


@pytest.fixture(scope="module")
def robot(tmp_path_factory):
    root = tmp_path_factory.mktemp("robot_scene")
    scene = make_scene(root / "vlmaps_dataset" / "test_1",
                       np.random.default_rng(0))

    cfg = load_config()
    cfg.params.gs = GS
    cfg.params.cs = CS
    cfg.map_config.grid_size = GS
    cfg.map_config.cell_size = CS
    cfg.map_config.pose_info.camera_height = CS * VH
    cfg.controller_config.gs = GS
    cfg.controller_config.cs = CS
    cfg.data_paths.avlmaps_data_dir = str(root)
    # skip CLIP obstacle customisation for speed
    cfg.map_config.potential_obstacle_names = ()
    cfg.map_config.obstacle_names = ()

    bot = HabitatLanguageRobot(cfg, sim=KinematicSimulator(
        cfg.params.forward_dist, cfg.params.turn_angle))
    # inject the tiny CLIP before setup (map feat dim is 8)
    from avlmaps_tpu.map.vlmap import VLMap

    orig_create = VLMap._init_clip
    enc = ClipEncoder.from_config(TINY_CLIP)

    def patched(self, clip_version="ViT-B/32"):
        self.clip_encoder = enc
        return enc

    VLMap._init_clip = patched
    try:
        bot.setup_scene(0)
    finally:
        VLMap._init_clip = orig_create
    # place the agent at a known map pose
    bot.vlmaps_dataloader.from_full_map_pose(40, 40, 0.0)
    bot.set_agent_state(bot.vlmaps_dataloader.to_habitat_tf())
    bot.empty_recorded_actions()
    return bot


class TestRobot:
    def test_setup(self, robot):
        assert robot.map is not None
        assert robot.nav.visgraph is not None
        assert robot.curr_pos_on_map is not None

    def test_move_to_reaches_goal(self, robot):
        robot.empty_recorded_actions()
        actions = robot.move_to((60, 60))
        assert actions[-1] == "stop"
        robot._set_nav_curr_pose()
        row, col = robot.curr_pos_on_map
        assert np.hypot(row - 60, col - 60) <= 3

    def test_turn(self, robot):
        robot._set_nav_curr_pose()
        before = robot.curr_ang_deg_on_map
        robot.turn(90)
        robot._set_nav_curr_pose()
        delta = (robot.curr_ang_deg_on_map - before) % 360
        # turn right 90 => heading decreases by ~90 (ccw-positive convention)
        assert abs(delta - 270) < 10

    def test_distribution_map_fusion(self, robot):
        m1 = robot.get_vl_distribution_map_3d("chair", decay_rate=0.1)
        m2 = robot.get_vl_distribution_map_3d("table", decay_rate=0.1)
        fused = m1 * m2
        assert fused.shape == (robot.map.grid_pos.shape[0],)
        pos = robot.get_max_pos_3d(fused)
        assert len(pos) == 3

    def test_get_map_2d(self, robot):
        m = robot.get_map(obj="chair")
        assert m.shape == robot.map.get_obstacle_cropped().shape
        assert 0 <= m.min() and m.max() <= 1.0 + 1e-6
        rc = robot.get_max_pos(m)
        assert len(rc) == 2

    def test_language_primitives(self, robot):
        robot.empty_recorded_actions()
        robot.move_to_object("chair")
        assert "stop" in robot.get_recorded_actions()

    def test_execute_llm_code(self, robot):
        robot.empty_recorded_actions()
        code = "robot.turn(20)\nrobot.move_forward(0.3)\n"
        robot.execute_code(code)
        assert len(robot.get_recorded_actions()) > 0


class TestRegionMaps:
    def test_gt_region_map(self, robot):
        # a GT region box in habitat coords around the agent's area
        robot.vlmaps_dataloader.from_full_map_pose(50, 50, 0.0)
        center_tf = robot.vlmaps_dataloader.to_habitat_tf()
        region_gt = {"kitchen": [{
            "region_center": center_tf[:3, 3].tolist(),
            "region_size": [1.0, 1.0, 1.0],
        }]}
        robot.load_gt_region_map(region_gt)
        robot.area_map_type = "gt"
        heat = robot.get_region_distribution_map("kitchen", decay_rate=0.05)
        assert heat.shape == robot.map.get_obstacle_cropped().shape
        assert heat.max() == pytest.approx(1.0)
        robot.area_map_type = "clip_sparse"
