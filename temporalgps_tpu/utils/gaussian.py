"""Dense multivariate Gaussian pytree.

TPU-native counterpart of the reference's `Gaussian` struct
(reference: src/util/gaussian.jl:16-71). Means carry shape (..., D) and
covariances (..., D, D); all operations broadcast over leading axes so a whole
time series of marginals is a single `Gaussian` with a leading time axis —
the struct-of-arrays layout that the reference reaches via StructArrays is
the native layout here.
"""

import jax
import jax.numpy as jnp

from ..config import IDENT_EPS
from . import psd
from .pytrees import pytree_dataclass


@pytree_dataclass
class Gaussian:
    mean: jnp.ndarray  # (..., D)
    cov: jnp.ndarray   # (..., D, D)

    @property
    def dim(self) -> int:
        return self.mean.shape[-1]

    @property
    def dtype(self):
        return self.mean.dtype


def gaussian_rand(key, x: Gaussian, sample_shape=()):
    """Sample with a 1e-12-jittered Cholesky (reference: util/gaussian.jl:33-43)."""
    L = psd.cholesky(psd.add_jitter(psd.symmetrize(x.cov), IDENT_EPS))
    eps = jax.random.normal(key, sample_shape + x.mean.shape, x.mean.dtype)
    return x.mean + jnp.einsum("...ij,...j->...i", L, eps)


def gaussian_logpdf(x: Gaussian, y):
    """log N(y; m, P), batched over leading axes (reference: util/gaussian.jl:45-53)."""
    D = x.dim
    L = psd.cholesky(psd.symmetrize(x.cov))
    alpha = psd.tri_solve(L, (y - x.mean)[..., None])[..., 0]
    maha = jnp.sum(alpha * alpha, axis=-1)
    return -0.5 * (D * jnp.log(2 * jnp.pi).astype(x.dtype) + psd.logdet_from_chol(L) + maha)


def gaussian_marginals(x: Gaussian):
    """Per-dimension (mean, var) pairs (reference: util/gaussian.jl:61-67)."""
    return x.mean, jnp.diagonal(x.cov, axis1=-2, axis2=-1)
