from . import fill, psd, pytrees
from .fill import Fill
from .gaussian import Gaussian, gaussian_logpdf, gaussian_marginals, gaussian_rand
from .regular_spacing import RegularSpacing

__all__ = [
    "Fill",
    "Gaussian",
    "RegularSpacing",
    "fill",
    "gaussian_logpdf",
    "gaussian_marginals",
    "gaussian_rand",
    "psd",
    "pytrees",
]
