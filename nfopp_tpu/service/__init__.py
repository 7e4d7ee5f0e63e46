"""Anytime replanning service + path postprocessing."""

from .postprocessor import PathPostprocessor  # noqa: F401
from .replanner import ReplanningService  # noqa: F401
from .world_state import RobotStateProvider, WorldState  # noqa: F401
