"""Shared example helpers: repo path setup and scale control.

Set TGPS_SCALE=small to run every example at test scale (the role of the
reference's TESTING env var, reference: examples/exact_time_inference.jl:45).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TGPS_PLATFORM"):
    # The ambient axon plugin overrides JAX_PLATFORMS; jax.config wins.
    import jax

    jax.config.update("jax_platforms", os.environ["TGPS_PLATFORM"])

SMALL = os.environ.get("TGPS_SCALE", "full") == "small"


def scaled(full, small):
    return small if SMALL else full
