"""Anytime replanning services + path postprocessing."""

from .fleet import FleetReplanningService  # noqa: F401
from .postprocessor import PathPostprocessor  # noqa: F401
from .replanner import ReplanningService  # noqa: F401
from .session import SessionAux, fleet_replan_session, replan_session  # noqa: F401
from .world_state import RobotStateProvider, WorldState  # noqa: F401
