"""Worlds: device-side collision oracles, synthetic scenes, benchmark scenarios."""

from .oracle import (  # noqa: F401
    CircleOracle,
    GridOracle,
    PolygonOracle,
    RectangleOracle,
    boundary_collision,
    circle_collision,
    grid_collision,
    pad_obstacle_points,
    pad_polygons,
    polygon_clearance,
    polygon_collision,
    rectangle_collision,
)
from .environments import (  # noqa: F401
    Environment,
    car_environment,
    two_walls_environment,
    two_walls_se2_environment,
)
from .scenarios import (  # noqa: F401
    GridScenario,
    corridor,
    dilate,
    distant_endpoints,
    resample_distant_endpoints,
    with_endpoints,
    parse_movingai_map,
    parse_movingai_scen,
    polygon_world,
    random_forest,
    random_free_pose,
    warehouse,
    warehouse_polygons,
)
