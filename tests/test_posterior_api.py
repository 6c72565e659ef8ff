"""Posterior prediction API vs dense-GP conditioning oracle
(reference: test/gp/posterior_lti_sde.jl:60-90)."""

import numpy as np
import pytest

import jax

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import GP, Matern32, Matern52, ConstMean, dense, to_sde
from temporalgps_tpu.gp import logpdf as prior_logpdf
from temporalgps_tpu.gp.posterior import logpdf, marginals, posterior, rand

N_TR = 11
N_PR = 7


def _setup(rng, kernel=None, mean=None):
    kernel = kernel if kernel is not None else 0.7 * Matern52().stretch(0.9)
    mean = mean if mean is not None else ConstMean(1.5)
    f = to_sde(GP(kernel, mean))
    x_tr = np.sort(rng.uniform(0.0, 5.0, N_TR))
    noise_tr = 0.1 + rng.random(N_TR)
    fx = f(x_tr, noise_tr)
    y = np.asarray(dense.dense_mean_cov(fx)[0]) + rng.standard_normal(N_TR)
    return f, fx, y


def test_posterior_marginals_same_points(rng):
    f, fx, y = _setup(rng)
    fp = posterior(fx, y)
    fxp = fp(fx.x, 0.2)
    m, v = marginals(fxp)
    fx_pred = f(fx.x, 0.2)
    m_want, v_want = dense.dense_posterior_marginals(fx, y, fx_pred)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_want), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_want), rtol=1e-6, atol=1e-8)


def test_posterior_marginals_new_points(rng):
    f, fx, y = _setup(rng)
    fp = posterior(fx, y)
    x_pr = np.sort(rng.uniform(-1.0, 6.0, N_PR))
    noise_pr = 0.05 + rng.random(N_PR) * 0.1
    fxp = fp(x_pr, noise_pr)
    m, v = marginals(fxp)
    m_want, v_want = dense.dense_posterior_marginals(fx, y, f(x_pr, noise_pr))
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_want), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_want), rtol=1e-5, atol=1e-7)


def test_posterior_marginals_interleaved_regular(rng):
    f, fx, y = _setup(rng, kernel=Matern32())
    fp = posterior(fx, y)
    x_pr = RegularSpacing(0.05, 0.45, N_PR)
    fxp = fp(x_pr, 1e-6)
    m, v = marginals(fxp)
    m_want, v_want = dense.dense_posterior_marginals(fx, y, f(x_pr, 1e-6))
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_want), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_want), rtol=1e-4, atol=1e-6)


def test_posterior_logpdf(rng):
    """logpdf of held-out data under the posterior == difference of joint and
    training logpdfs under the prior (chain rule of densities)."""
    f, fx, y = _setup(rng)
    fp = posterior(fx, y)
    x_pr = np.sort(rng.uniform(0.2, 4.8, N_PR))
    noise_pr = 0.3
    y_pr = rng.standard_normal(N_PR)
    lp_post = float(logpdf(fp(x_pr, noise_pr), y_pr))

    # Oracle: log p(y_pr | y) = log p(y, y_pr) - log p(y)
    t_all = np.concatenate([np.asarray(fx.x), x_pr])
    order = np.argsort(t_all)
    noise_all = np.concatenate([np.asarray(fx.noise), np.full(N_PR, noise_pr)])
    y_all = np.concatenate([y, y_pr])
    fx_joint = f(t_all[order], noise_all[order])
    lp_joint = float(dense.dense_logpdf(fx_joint, y_all[order]))
    lp_train = float(dense.dense_logpdf(fx, y))
    np.testing.assert_allclose(lp_post, lp_joint - lp_train, rtol=1e-6, atol=1e-6)


def test_posterior_rand(rng):
    f, fx, y = _setup(rng, kernel=Matern52())
    fp = posterior(fx, y)
    x_pr = np.sort(rng.uniform(0.0, 5.0, N_PR))
    fxp = fp(x_pr, 0.1)
    keys = jax.random.split(jax.random.PRNGKey(3), 4000)
    ys = np.asarray(jax.vmap(lambda k: rand(k, fxp))(keys))
    assert ys.shape == (4000, N_PR)
    m_want, v_want = dense.dense_posterior_marginals(fx, y, f(x_pr, 0.1))
    np.testing.assert_allclose(ys.mean(0), np.asarray(m_want), atol=0.1)
    np.testing.assert_allclose(ys.var(0), np.asarray(v_want), rtol=0.2, atol=0.02)


def test_posterior_engines_match(rng):
    f, fx, y = _setup(rng)
    fp = posterior(fx, y)
    x_pr = np.sort(rng.uniform(0.0, 5.0, N_PR))
    fxp = fp(x_pr, 0.2)
    m_seq, v_seq = marginals(fxp, engine="sequential")
    for eng in ("parallel", "block"):
        m_e, v_e = marginals(fxp, engine=eng)
        np.testing.assert_allclose(np.asarray(m_e), np.asarray(m_seq), rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(np.asarray(v_e), np.asarray(v_seq), rtol=1e-8, atol=1e-9)


def test_posterior_engines_match_same_inputs(rng):
    """Same-inputs fast branch across engines — the block engine here drives
    a REVERSE-ordered posterior model through the affine marginal pipeline
    (the TPU auto-route after _resolve_engine_affine; on CPU the XLA block
    path exercises the same reverse-order algebra)."""
    f, fx, y = _setup(rng)
    fp = posterior(fx, y)
    fxp = fp(fx.x, 0.2)
    m_seq, v_seq = marginals(fxp, engine="sequential")
    for eng in ("parallel", "block"):
        m_e, v_e = marginals(fxp, engine=eng)
        np.testing.assert_allclose(np.asarray(m_e), np.asarray(m_seq), rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(np.asarray(v_e), np.asarray(v_seq), rtol=1e-8, atol=1e-9)
