"""Robot API: language primitives + simulator bindings."""

from avlmaps_tpu.robot.lang_robot import LangRobot
from avlmaps_tpu.robot.habitat_lang_robot import HabitatLanguageRobot
from avlmaps_tpu.robot.sim import (
    Simulator, KinematicSimulator, HabitatSimulator, HABITAT_AVAILABLE,
)

__all__ = [
    "LangRobot", "HabitatLanguageRobot", "Simulator", "KinematicSimulator",
    "HabitatSimulator", "HABITAT_AVAILABLE",
]
