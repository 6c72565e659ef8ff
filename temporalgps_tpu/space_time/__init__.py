from .grids import (
    RectilinearGrid,
    RegularInTime,
    SpaceTimeGrid,
    regular_in_time,
)
from .pseudo_point import (
    approx_posterior_marginals_at,
    DTCSeparable,
    approx_posterior_marginals,
    dtc,
    dtcify,
    elbo,
)
from .separable import Separable

__all__ = [
    "RectilinearGrid",
    "RegularInTime",
    "SpaceTimeGrid",
    "Separable",
    "DTCSeparable",
    "regular_in_time",
    "dtc",
    "dtcify",
    "elbo",
    "approx_posterior_marginals",
    "approx_posterior_marginals_at",
]
