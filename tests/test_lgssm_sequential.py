"""Oracle tests: sequential LGSSM engine vs the naive dense joint Gaussian.

Mirrors the reference's LGSSM sweep (test/models/lgssm.jl:15-36): emission
kind x ordering x time-varying grid, checking logpdf / marginals /
posterior-marginals against dense formulas.
"""

import numpy as np
import pytest

from model_test_utils import random_lgssm, random_obs
from temporalgps_tpu.models import (
    LGSSM,
    logpdf,
    marginals,
    marginals_diag,
    posterior,
    rand,
)
from temporalgps_tpu.models import naive
from temporalgps_tpu.models.emissions import ScalarEmissions
from temporalgps_tpu.models.missings import replace_observation_noise_cov  # noqa: F401

CASES = [
    dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=True),
    dict(kind="scalar", D=3, Dout=1, time_varying=False, forward=True),
    dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=False),
    dict(kind="dense", D=3, Dout=2, time_varying=True, forward=True),
    dict(kind="dense", D=2, Dout=2, time_varying=False, forward=True),
    dict(kind="dense", D=3, Dout=2, time_varying=True, forward=False),
    dict(kind="large", D=2, Dout=4, time_varying=True, forward=True),
    dict(kind="bottleneck", D=3, Dout=4, time_varying=True, forward=True),
]


@pytest.mark.parametrize("case", CASES, ids=[str(c) for c in CASES])
def test_logpdf_vs_naive(rng, case):
    model = random_lgssm(rng, N=7, **case)
    y = random_obs(rng, model)
    got = float(logpdf(model, y))
    want = naive.naive_logpdf(model, y)
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("case", CASES, ids=[str(c) for c in CASES])
def test_marginals_vs_naive(rng, case):
    model = random_lgssm(rng, N=6, **case)
    ys = marginals(model)
    want_means, want_covs = naive.naive_marginals(model)
    means_got = np.asarray(ys.mean)
    covs_got = np.asarray(ys.cov)
    for t in range(len(model)):
        m = np.atleast_1d(means_got[t])
        P = np.atleast_2d(covs_got[t])
        np.testing.assert_allclose(m, want_means[t], rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(P, want_covs[t], rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("case", CASES, ids=[str(c) for c in CASES])
def test_marginals_diag_consistency(rng, case):
    model = random_lgssm(rng, N=6, **case)
    ys = marginals(model)
    m_diag, v_diag = marginals_diag(model)
    np.testing.assert_allclose(np.asarray(m_diag), np.asarray(ys.mean), rtol=1e-10)
    if isinstance(model.emis, ScalarEmissions):
        np.testing.assert_allclose(np.asarray(v_diag), np.asarray(ys.cov), rtol=1e-10)
    else:
        np.testing.assert_allclose(
            np.asarray(v_diag),
            np.diagonal(np.asarray(ys.cov), axis1=-2, axis2=-1),
            rtol=1e-10,
        )


@pytest.mark.parametrize(
    "case", [c for c in CASES if c["forward"]], ids=str
)
def test_posterior_marginals_vs_naive(rng, case):
    model = random_lgssm(rng, N=6, **case)
    y = random_obs(rng, model)
    post = posterior(model, y)
    assert post.trans.forward == (not model.trans.forward)
    ys = marginals(post)
    want_means, want_covs = naive.naive_posterior_marginals(model, y)
    means_got = np.asarray(ys.mean)
    covs_got = np.asarray(ys.cov)
    for t in range(len(model)):
        np.testing.assert_allclose(
            np.atleast_1d(means_got[t]), want_means[t], rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(
            np.atleast_2d(covs_got[t]), want_covs[t], rtol=1e-6, atol=1e-8
        )


@pytest.mark.parametrize("kind", ["scalar", "dense"])
def test_posterior_logpdf_vs_dense_conditional(rng, kind):
    """logpdf(posterior(model, y), y2) against the dense conditional oracle:
    the posterior LGSSM keeps the prior's emissions, so its logpdf of y2 is
    log p(y2' | y) with y2' a fresh noisy re-observation of the latent chain
    (naive.naive_posterior_logpdf)."""
    model = random_lgssm(rng, kind=kind, D=2, Dout=2 if kind == "dense" else 1, N=5)
    y = random_obs(rng, model)
    y2 = random_obs(rng, model)
    post = posterior(model, y)
    for y_eval in (y2, y):
        got = float(logpdf(post, y_eval))
        want = naive.naive_posterior_logpdf(model, y, y_eval)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_rand_moments(rng):
    """Sampling sanity: empirical mean/var of samples match marginals."""
    import jax

    model = random_lgssm(rng, kind="scalar", D=2, Dout=1, N=4, time_varying=False)
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    ys = jax.vmap(lambda k: rand(k, model))(keys)
    ys = np.asarray(ys)
    m_diag, v_diag = marginals_diag(model)
    np.testing.assert_allclose(ys.mean(axis=0), np.asarray(m_diag), atol=0.15)
    np.testing.assert_allclose(ys.var(axis=0), np.asarray(v_diag), rtol=0.15)
