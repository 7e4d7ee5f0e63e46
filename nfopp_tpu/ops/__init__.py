"""Device-side primitive ops: math, sampling, losses, reparametrization, preconditioning."""

from . import math  # noqa: F401
from . import hessian  # noqa: F401
from . import sampling  # noqa: F401
from . import losses  # noqa: F401
from . import reparametrize  # noqa: F401
