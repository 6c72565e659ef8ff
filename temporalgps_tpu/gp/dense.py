"""Naive dense GP — the O(N^3) oracle playing AbstractGPs' role in tests
(reference strategy: test/gp/lti_sde.jl:179-201). Never used in the hot path.
"""

import jax.numpy as jnp

from ..utils.fill import is_fill
from ..utils.regular_spacing import time_array
from . import kernels as K
from .means import mean_vector


def _noise_diag(fx):
    n = fx.noise
    if is_fill(n):
        return jnp.broadcast_to(n.value, (n.N,))
    return n


def dense_mean_cov(fx):
    t = time_array(fx.x)
    m = mean_vector(fx.f.f.mean, t)
    C = K.gram(fx.f.f.kernel, t) + jnp.diag(_noise_diag(fx))
    return m, C


def dense_logpdf(fx, y):
    m, C = dense_mean_cov(fx)
    L = jnp.linalg.cholesky(C)
    alpha = jnp.linalg.solve(L, (jnp.asarray(y) - m)[:, None])[:, 0]
    n = m.shape[0]
    return -0.5 * (
        n * jnp.log(2 * jnp.pi)
        + 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
        + jnp.sum(alpha * alpha)
    )


def dense_marginals(fx):
    m, C = dense_mean_cov(fx)
    return m, jnp.diagonal(C)


def dense_posterior_marginals(fx, y, fx_pred):
    """Posterior mean/var at fx_pred's inputs given observations y at fx's."""
    t_tr = time_array(fx.x)
    t_pr = time_array(fx_pred.x)
    kern = fx.f.f.kernel
    m_tr = mean_vector(fx.f.f.mean, t_tr)
    m_pr = mean_vector(fx.f.f.mean, t_pr)
    C_tr = K.gram(kern, t_tr) + jnp.diag(_noise_diag(fx))
    C_cross = K.gram(kern, t_pr, t_tr)
    C_pr = K.gram(kern, t_pr) + jnp.diag(_noise_diag(fx_pred))
    sol = jnp.linalg.solve(C_tr, (jnp.asarray(y) - m_tr))
    mean_post = m_pr + C_cross @ sol
    cov_post = C_pr - C_cross @ jnp.linalg.solve(C_tr, C_cross.T)
    return mean_post, jnp.diagonal(cov_post)
