"""temporalgps_tpu — a TPU-native state-space Gaussian-process framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
JuliaGaussianProcesses/TemporalGPs.jl: GPs on time series via their LTI-SDE /
LGSSM representation, O(N) (and O(log N)-depth parallel) Kalman filtering and
RTS smoothing, exact and pseudo-point spatio-temporal inference.
"""

from . import config  # noqa: F401  (enables x64; must import first)
from .utils import Fill, Gaussian, RegularSpacing

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level re-exports (mirrors the reference's export list,
    reference: src/TemporalGPs.jl:24-33, plus the kernel/mean vocabulary)."""
    import importlib

    if name.startswith("_") or name in ("gp", "space_time", "models", "ops",
                                        "parallel", "utils", "learning"):
        raise AttributeError(name)
    import types

    for mod_name in ("gp", "space_time"):
        mod = importlib.import_module(f"{__name__}.{mod_name}")
        if hasattr(mod, name):
            attr = getattr(mod, name)
            # Submodules loaded as import side effects (e.g. gp.posterior)
            # must not shadow same-named functions: the winner would depend
            # on import order.
            if not isinstance(attr, types.ModuleType):
                return attr
    if name == "posterior":
        return importlib.import_module(f"{__name__}.gp.posterior").posterior
    if name == "fit":
        return importlib.import_module(f"{__name__}.learning").fit
    raise AttributeError(f"module 'temporalgps_tpu' has no attribute {name!r}")


__all__ = [
    "Fill",
    "Gaussian",
    "RegularSpacing",
    # lazily re-exported: to_sde, GP, kernels, storages, Separable, grids,
    # dtc, elbo, approx_posterior_marginals, posterior, fit, ...
]
