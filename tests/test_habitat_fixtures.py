"""Habitat conversion math pinned by fixtures — no habitat-sim needed
(VERDICT r2 next #8).

The reference's converters (avlmaps/utils/habitat_utils.py:171-186) are
scipy Rotation round-trips; scipy is therefore the exact oracle for our
quaternion math, plus hand-constructed state<->tf pairs.  The sensor-suite
and action-space construction (make_cfg, habitat_utils.py:12-74) is pinned
through the pure plan_sensor_specs / plan_action_space.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from avlmaps_tpu.robot.sim import (
    KinematicSimulator, agent_state_to_tf, tf_to_agent_state,
    plan_action_space, plan_sensor_specs,
)

SETTINGS = {
    "width": 1080, "height": 720, "sensor_height": 1.5,
    "color_sensor": True, "depth_sensor": True, "semantic_sensor": True,
    "move_forward": 0.1, "turn_left": 5.0, "turn_right": 5.0,
}


class TestAgentStateConversions:
    def test_matches_scipy_oracle(self):
        """agent_state2tf is R.from_quat (reference :180-186); ours must
        agree for arbitrary unit quaternions."""
        rng = np.random.default_rng(0)
        for _ in range(25):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            pos = rng.uniform(-5, 5, 3)
            tf = agent_state_to_tf(pos, q)
            np.testing.assert_allclose(tf[:3, :3], R.from_quat(q).as_matrix(),
                                       atol=1e-12)
            np.testing.assert_allclose(tf[:3, 3], pos)

    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        for _ in range(25):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            pos = rng.uniform(-5, 5, 3)
            p2, q2 = tf_to_agent_state(agent_state_to_tf(pos, q))
            np.testing.assert_allclose(p2, pos)
            # q and -q encode the same rotation
            if np.dot(q2, q) < 0:
                q2 = -q2
            np.testing.assert_allclose(q2, q, atol=1e-10)

    def test_hand_constructed_pairs(self):
        """Fixture pairs from the reference's conventions (y-up habitat
        world; identity quaternion = looking down -z)."""
        # identity
        tf = agent_state_to_tf(np.array([1.0, 1.5, -2.0]),
                               np.array([0, 0, 0, 1.0]))
        np.testing.assert_allclose(tf, [[1, 0, 0, 1.0], [0, 1, 0, 1.5],
                                        [0, 0, 1, -2.0], [0, 0, 0, 1]])
        # 90 deg yaw left (about +y): quat xyzw = (0, sin45, 0, cos45);
        # rotates -z onto -x (habitat agent turning left)
        s2 = np.sqrt(0.5)
        tf = agent_state_to_tf(np.zeros(3), np.array([0, s2, 0, s2]))
        fwd = tf[:3, :3] @ np.array([0, 0, -1.0])
        np.testing.assert_allclose(fwd, [-1, 0, 0], atol=1e-12)
        # 180 deg yaw: looking down +z
        tf = agent_state_to_tf(np.zeros(3), np.array([0, 1.0, 0, 0]))
        np.testing.assert_allclose(tf[:3, :3] @ np.array([0, 0, -1.0]),
                                   [0, 0, 1], atol=1e-12)

    def test_kinematic_sim_agrees_with_quaternion_math(self):
        """18 turn_left steps at 5 deg = 90 deg yaw; the fake's tf equals
        the quaternion-constructed agent state."""
        sim = KinematicSimulator(forward_dist=0.1, turn_angle_deg=5.0)
        for _ in range(18):
            sim.step("turn_left")
        s2 = np.sqrt(0.5)
        expect = agent_state_to_tf(np.zeros(3), np.array([0, s2, 0, s2]))
        np.testing.assert_allclose(sim.get_agent_tf(), expect, atol=1e-9)
        sim.step("move_forward")
        np.testing.assert_allclose(sim.get_agent_tf()[:3, 3], [-0.1, 0, 0],
                                   atol=1e-9)


class TestSensorSpecPlan:
    def test_reference_sensor_suite(self):
        """Matches make_cfg's suite (reference habitat_utils.py:12-58):
        rear 3rd-person colour sensor always first, then the gated
        color/depth/semantic at the agent's eye."""
        specs = plan_sensor_specs(SETTINGS)
        uuids = [s["uuid"] for s in specs]
        assert uuids == ["back_color_sensor", "color_sensor", "depth_sensor",
                         "semantic_sensor"]
        back = specs[0]
        np.testing.assert_allclose(back["position"], [0.0, 1.5, 1.3])
        np.testing.assert_allclose(back["orientation"],
                                   [-np.pi / 8, 0.0, 0.0])
        for s in specs[1:]:
            np.testing.assert_allclose(s["position"], [0.0, 1.5, 0.0])
            np.testing.assert_allclose(s["orientation"], [0.0, 0.0, 0.0])
            assert s["resolution"] == [720, 1080]  # [height, width]!

    def test_sensor_toggles(self):
        s = dict(SETTINGS, depth_sensor=False, semantic_sensor=False,
                 back_color_sensor=False)
        assert [x["uuid"] for x in plan_sensor_specs(s)] == ["color_sensor"]

    def test_action_space_turn_left_uses_turn_right_amount(self):
        """Reference quirk (habitat_utils.py:66-70): turn_left's actuation
        amount comes from settings['turn_right']."""
        amounts = plan_action_space(dict(SETTINGS, turn_left=7.0,
                                         turn_right=3.0))
        assert amounts["turn_left"] == 3.0
        assert amounts["turn_right"] == 3.0
        assert amounts["move_forward"] == pytest.approx(0.1)
