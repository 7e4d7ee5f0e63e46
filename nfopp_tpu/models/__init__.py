"""Neural models: the ONF occupancy field."""

from .onf import ONFConfig, init_onf_params, onf_apply, onf_param_count  # noqa: F401
