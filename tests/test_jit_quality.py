"""Compiler-quality gates: every public driver jit-compiles, does not
retrace on same-shaped inputs, and supports grad where meaningful.

JAX analogue of the reference's JET.jl static-inference checks on every path
(reference: test/test_util.jl:34-57 @test_opt; SURVEY.md §4.4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import GP, Matern32, Matern52, to_sde
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.gp.posterior import posterior, marginals as post_marginals

N = 64


def _fx(noise=0.1):
    return to_sde(GP(Matern52()))(RegularSpacing(0.0, 0.1, N), noise)


@pytest.mark.parametrize("engine", ["sequential", "parallel", "block",
                                    "lti", "steady"])
def test_logpdf_jits_and_no_retrace(rng, engine):
    fx = _fx()
    traces = []
    # n_warmup=16 < N so the steady branch (not the lti delegation) traces
    kw = {"n_warmup": 16} if engine == "steady" else {}

    @jax.jit
    def lp(y):
        traces.append(1)
        return api.logpdf(fx, y, engine=engine, **kw)

    y1 = jnp.asarray(rng.standard_normal(N))
    y2 = jnp.asarray(rng.standard_normal(N))
    v1, v2 = float(lp(y1)), float(lp(y2))
    assert np.isfinite(v1) and np.isfinite(v2)
    assert len(traces) == 1, "logpdf retraced on same-shaped input"


@pytest.mark.parametrize("engine", ["sequential", "parallel"])
def test_rand_marginals_jit(rng, engine):
    fx = _fx()
    ys = jax.jit(lambda k: api.rand(k, fx, engine=engine))(jax.random.PRNGKey(0))
    assert ys.shape == (N,)
    m, v = jax.jit(lambda: api.marginals(fx, engine=engine))()
    assert m.shape == v.shape == (N,)


def test_rand_multi_sample(rng):
    fx = _fx()
    ys = api.rand(jax.random.PRNGKey(0), fx, 7)
    assert ys.shape == (7, N)


def test_posterior_marginals_jit_end_to_end(rng):
    fx = _fx(0.3)
    y = jnp.asarray(rng.standard_normal(N))
    fp = posterior(fx, y)

    # same-input path is fully jittable (index bookkeeping is static)
    @jax.jit
    def run(y2):
        fp2 = posterior(api.FiniteLTISDE(fx.f, fx.x, fx.noise), y2)
        return post_marginals(fp2(fx.x, 0.1))

    m, v = run(y)
    assert np.all(np.isfinite(np.asarray(m)))


def test_value_and_grad_all_engines(rng):
    x = np.sort(rng.uniform(0, 5, N))
    y = jnp.asarray(rng.standard_normal(N))
    for engine in ["sequential", "parallel", "block"]:
        def loss(p):
            kern = (jnp.exp(p[0]) * Matern32()).stretch(jnp.exp(p[1]))
            return -api.logpdf(to_sde(GP(kern))(x, 0.2), y, engine=engine)

        v, g = jax.jit(jax.value_and_grad(loss))(jnp.zeros(2))
        assert np.isfinite(float(v)) and np.all(np.isfinite(np.asarray(g)))
