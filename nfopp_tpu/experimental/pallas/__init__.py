"""Pallas TPU kernels for the NFOPP hot path."""

from .onf_fused import onf_apply_fused, pad_onf_params  # noqa: F401
