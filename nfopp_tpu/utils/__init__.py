"""Host-side utilities: config, factory, timers, geometry, SE(2) poses."""

from .compile_cache import enable_tpu_compile_cache  # noqa: F401
from .config import AttributeDict, Config, deep_update  # noqa: F401
from .factory import UniversalFactory  # noqa: F401
from .position2 import Position2  # noqa: F401
from .timer import Timer, timer  # noqa: F401
from . import host_math  # noqa: F401
