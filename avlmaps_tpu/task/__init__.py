"""Navigation tasks + replay evaluation."""

from avlmaps_tpu.task.tasks import (
    HabitatTask, HabitatObjectNavigationTask,
    HabitatSpatialGoalNavigationTask,
)

__all__ = [
    "HabitatTask", "HabitatObjectNavigationTask",
    "HabitatSpatialGoalNavigationTask",
]
