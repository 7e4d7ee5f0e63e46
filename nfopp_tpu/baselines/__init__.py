"""Comparison baselines (the reference's run_gpmp2.py role), JAX-native."""

from .gpmp2 import GPMP2Config, SDF, build_sdf, gpmp2_plan  # noqa: F401
