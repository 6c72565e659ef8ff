"""temporalgps_tpu — a TPU-native state-space Gaussian-process framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
JuliaGaussianProcesses/TemporalGPs.jl: GPs on time series via their LTI-SDE /
LGSSM representation, O(N) (and O(log N)-depth parallel) Kalman filtering and
RTS smoothing, exact and pseudo-point spatio-temporal inference.
"""

from . import config  # noqa: F401  (enables x64; must import first)
from .utils import Fill, Gaussian, RegularSpacing

__version__ = "0.1.0"

__all__ = [
    "Fill",
    "Gaussian",
    "RegularSpacing",
]
