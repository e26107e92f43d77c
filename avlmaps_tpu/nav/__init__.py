"""Host-side navigation: visibility-graph planning + discrete control."""

from avlmaps_tpu.nav.visgraph import (
    VisGraph, build_visgraph_with_obs_map, plan_to_pos_v2, line_clear,
)
from avlmaps_tpu.nav.navigator import Navigator
from avlmaps_tpu.nav.controller import NavController, DiscreteNavController

__all__ = [
    "VisGraph", "build_visgraph_with_obs_map", "plan_to_pos_v2",
    "line_clear", "Navigator", "NavController", "DiscreteNavController",
]
