"""Grid search initializers: host A*/JPS + device batched wavefront."""

from .grid_search import GridSearch, astar, jump_point_search  # noqa: F401
from .initializer import AstarTrajectoryInitializer, batched_wavefront_trajectories  # noqa: F401
from .wavefront import distance_field, extract_path, wavefront_path  # noqa: F401
