"""Steady-state engine (ops/steady.py) vs the sequential ground truth.

The steady engine is an approximation (converged Riccati covariance beyond
n_warmup); at f64 with dt large enough that the closed-loop recursion has
converged well inside the warmup (lambda*dt ~ 0.1-0.2 here), it must agree
with the exact sequential engine to near machine precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import EQ, GP, Cosine, Matern52, to_sde, rand
from temporalgps_tpu.gp.lti_sde import build_lgssm
from temporalgps_tpu.models import lgssm as lg
from temporalgps_tpu.ops import steady as steady_mod
from temporalgps_tpu.ops.steady import affine_const_states


@pytest.fixture(autouse=True)
def short_warmup(monkeypatch):
    """Shrink the default warmup so the steady branch is exercised at
    test-sized N (the engine contract only needs n_warmup >~ 5/(lambda dt);
    lambda*dt >= 0.1 in every model here, so 128 is converged to ~e-28)."""
    monkeypatch.setattr(steady_mod, "DEFAULT_WARMUP", 128)


def test_affine_const_states_vs_loop(rng):
    D, M = 5, 237
    G = jnp.asarray(rng.standard_normal((D, D)) * 0.3)
    w = jnp.asarray(rng.standard_normal((M, D)))
    m0 = jnp.asarray(rng.standard_normal(D))
    got = affine_const_states(G, w, m0, block_len=16)
    m, want = m0, []
    for t in range(M):
        m = G @ m + w[t]
        want.append(m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.stack(want)),
                               atol=1e-12)


def test_affine_const_states_multi_vs_columns(rng):
    """The flat kron-lifted (R*D)-state form equals R independent vector
    recursions, including its reverse mode (the lift is what keeps every
    N-sized reverse-mode residual in ~1x-padding (M, R*D) layout on TPU —
    the (M, D, R) form OOMed at 165 GB, see ops/steady docstring)."""
    from temporalgps_tpu.ops.steady import affine_const_states_multi

    D, R, M = 4, 6, 97
    G = jnp.asarray(rng.standard_normal((D, D)) * 0.25)
    W = jnp.asarray(rng.standard_normal((M, D, R)))
    m0 = jnp.asarray(rng.standard_normal((D, R)))
    got = affine_const_states_multi(G, W, m0, block_len=5)
    want = jnp.stack(
        [
            affine_const_states(G, W[:, :, r], m0[:, r], block_len=5)
            for r in range(R)
        ],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)

    def f_multi(G_):
        return jnp.sum(affine_const_states_multi(G_, W, m0, block_len=5) ** 2)

    def f_cols(G_):
        return sum(
            jnp.sum(affine_const_states(G_, W[:, :, r], m0[:, r],
                                        block_len=5) ** 2)
            for r in range(R)
        )

    g_multi = jax.grad(f_multi)(G)
    g_cols = jax.grad(f_cols)(G)
    np.testing.assert_allclose(np.asarray(g_multi), np.asarray(g_cols),
                               rtol=1e-10)


def _scalar_model(N=448, dt=0.1):
    x = RegularSpacing(0.0, dt, N)
    fx = to_sde(GP(Matern52()))(x, 0.1)
    return build_lgssm(fx), x


def test_scalar_logpdf_vs_sequential(rng):
    model, _ = _scalar_model()
    y = rng.standard_normal(len(model))
    lp_seq = float(lg.logpdf(model, y, engine="sequential"))
    lp_st = float(lg.logpdf(model, y, engine="steady"))
    np.testing.assert_allclose(lp_st, lp_seq, rtol=1e-12)


def test_scalar_grad_vs_sequential(rng):
    _, x = _scalar_model()
    y = rng.standard_normal(x.N)

    def loss(p, engine):
        s2, sc, noise = jnp.exp(p)
        fx = to_sde(GP((s2 * Matern52()).stretch(sc)))(x, noise)
        return lg.logpdf(build_lgssm(fx), y, engine=engine)

    g_seq = jax.grad(lambda p: loss(p, "sequential"))(jnp.zeros(3))
    g_st = jax.grad(lambda p: loss(p, "steady"))(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(g_st), np.asarray(g_seq), rtol=1e-10)


def test_marginals_vs_sequential(rng):
    model, _ = _scalar_model()
    m1, v1 = lg.marginals_diag(model, engine="sequential")
    m2, v2 = lg.marginals_diag(model, engine="steady")
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-12)
    xs1 = lg.latent_marginals(model, engine="sequential")
    xs2 = lg.latent_marginals(model, engine="steady")
    np.testing.assert_allclose(np.asarray(xs2.mean), np.asarray(xs1.mean),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(xs2.cov), np.asarray(xs1.cov),
                               atol=1e-12)


def test_delegates_to_lti_when_warmup_covers_n(rng):
    model, _ = _scalar_model(N=300)
    y = rng.standard_normal(300)
    from temporalgps_tpu.ops import lti, steady

    lp_st = float(steady.logpdf(model, y, n_warmup=512))
    lp_lti = float(lti.logpdf(model, y))
    assert lp_st == lp_lti  # exact delegation, bit-identical


def test_dtc_elbo_and_grad_vs_sequential(rng):
    from temporalgps_tpu.space_time import (
        RectilinearGrid,
        Separable,
        dtcify,
        elbo,
        grids,
    )

    Ns, Nt, M = 5, 320, 3
    r = jnp.asarray(np.linspace(-3, 3, Ns))
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.05, Nt))
    k = Separable(EQ().stretch(0.7), Matern52())
    fx = to_sde(GP(k))(x, 0.1)
    y = np.asarray(rand(jax.random.PRNGKey(0), fx))
    z = jnp.asarray(np.linspace(-3, 3, M))

    model = build_lgssm(dtcify(z, fx))
    y_tf = grids.observations_to_time_form(fx.x, jnp.asarray(y))
    lp_seq = float(lg.logpdf(model, y_tf, engine="sequential"))
    lp_st = float(lg.logpdf(model, y_tf, engine="steady"))
    np.testing.assert_allclose(lp_st, lp_seq, rtol=1e-9)

    def loss(p, engine):
        s2, sc, noise = jnp.exp(p)
        kern = s2 * Separable(EQ().stretch(sc), Matern52())
        return elbo(to_sde(GP(kern))(x, noise), jnp.asarray(y), z, engine=engine)

    # one value_and_grad trace per engine covers both the elbo value and
    # the hyperparameter-gradient oracles (compile time dominates here)
    e_seq, g_seq = jax.value_and_grad(lambda p: loss(p, "sequential"))(jnp.zeros(3))
    e_st, g_st = jax.value_and_grad(lambda p: loss(p, "steady"))(jnp.zeros(3))
    np.testing.assert_allclose(float(e_st), float(e_seq), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_st), np.asarray(g_seq), rtol=1e-6)


def test_rejects_det_blocks_and_non_fill(rng):
    x = RegularSpacing(0.0, 0.1, 200)
    fx = to_sde(GP(Matern52() + Cosine()))(x, 0.1)
    model = build_lgssm(fx)
    y = rng.standard_normal(200)
    with pytest.raises(ValueError, match="deterministic"):
        lg.logpdf(model, y, engine="steady")

    xs = np.sort(rng.uniform(0.0, 4.0, 200))
    fx_irr = to_sde(GP(Matern52()))(xs, 0.1)
    model_irr = build_lgssm(fx_irr)
    with pytest.raises(ValueError, match="Fill"):
        lg.logpdf(model_irr, y, engine="steady")


def test_posterior_marginals_diag_vs_exact(rng):
    from temporalgps_tpu.models.lgssm import LGSSM
    from temporalgps_tpu.ops import steady

    model, _ = _scalar_model()
    y = jnp.asarray(rng.standard_normal(len(model)))
    post = lg.posterior(model, y, engine="sequential")
    m_ref, v_ref = lg.marginals_diag(LGSSM(post.trans, model.emis),
                                     engine="sequential")
    m_st, v_st = steady.posterior_marginals_diag(model, y, n_warmup=128)
    np.testing.assert_allclose(np.asarray(m_st), np.asarray(m_ref),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(v_st), np.asarray(v_ref),
                               rtol=1e-8)


def test_posterior_marginals_diag_small_n_delegates(rng):
    from temporalgps_tpu.models.lgssm import LGSSM
    from temporalgps_tpu.ops import steady

    model, _ = _scalar_model(N=100)
    y = jnp.asarray(rng.standard_normal(100))
    post = lg.posterior(model, y, engine="sequential")
    m_ref, v_ref = lg.marginals_diag(LGSSM(post.trans, model.emis),
                                     engine="sequential")
    m_st, v_st = steady.posterior_marginals_diag(model, y, n_warmup=256)
    np.testing.assert_allclose(np.asarray(m_st), np.asarray(m_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_st), np.asarray(v_ref), rtol=1e-9)


def test_dtc_approx_posterior_marginals_steady(rng):
    from temporalgps_tpu.space_time import (
        RectilinearGrid,
        Separable,
        approx_posterior_marginals,
    )

    Ns, Nt, M = 5, 320, 3
    r = jnp.asarray(np.linspace(-3, 3, Ns))
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.05, Nt))
    k = Separable(EQ().stretch(0.7), Matern52())
    fx = to_sde(GP(k))(x, 0.1)
    y = jnp.asarray(np.asarray(rand(jax.random.PRNGKey(0), fx)))
    z = jnp.asarray(np.linspace(-3, 3, M))
    x_pr = RectilinearGrid(jnp.asarray(np.linspace(-2, 2, 4)),
                           RegularSpacing(0.0, 0.05, Nt))

    m_ref, v_ref = approx_posterior_marginals(fx, y, z, x_pr,
                                              engine="sequential")
    m_st, v_st = approx_posterior_marginals(fx, y, z, x_pr, engine="steady")
    np.testing.assert_allclose(np.asarray(m_st), np.asarray(m_ref),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(v_st), np.asarray(v_ref), rtol=5e-8)


def test_f32_grad_accuracy_vs_f64_truth(rng):
    """f32 steady hyperparameter gradients within ~1e-3 of the f64 truth.

    Regression for two measured f32 failure modes (both warmup-side):
    pure-f32 constant steady-state operators bias the lml by ~3.5e-4 rel at
    any N (fixed: ops/steady._hi), and f32 reverse-mode through the lti
    warmup's constant-element power chain loses accuracy ~linearly in the
    warmup length, 2.5e-2 rel at k=512 (fixed: _filter_pass(cov_hi=True)).
    """
    N = 1024
    yv = rng.standard_normal(N)

    def mk(dtype):
        x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), N)
        y = jnp.asarray(yv, dtype)

        def loss(p):
            from temporalgps_tpu.gp import ArrayStorage

            s2, sc, noise = jnp.exp(p)
            kern = (s2 * Matern52()).stretch(sc)
            fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
            return lg.logpdf(build_lgssm(fx), y, engine="steady")

        return loss

    p64 = jnp.asarray([0.1, -0.2, -2.0], jnp.float64)
    g64 = np.asarray(jax.grad(mk(jnp.float64))(p64), np.float64)
    g32 = np.asarray(jax.grad(mk(jnp.float32))(p64.astype(jnp.float32)),
                     np.float64)
    rel = np.abs(g32 - g64) / (np.abs(g64) + 1e-6)
    assert rel.max() < 2e-3, (g32, g64, rel)


def test_n_warmup_threads_through_drivers(rng):
    """n_warmup reaches the steady engine from the public drivers, and
    suggest_warmup returns a sane host-side recommendation."""
    from temporalgps_tpu.ops import steady
    from temporalgps_tpu.space_time import (
        RectilinearGrid,
        Separable,
        approx_posterior_marginals,
        elbo,
    )

    model, x = _scalar_model()
    y = rng.standard_normal(448)
    lp_small = float(lg.logpdf(model, y, engine="steady", n_warmup=96))
    lp_default = float(lg.logpdf(model, y, engine="steady"))
    np.testing.assert_allclose(lp_small, lp_default, rtol=1e-10)

    k = steady.suggest_warmup(model)
    assert 64 <= k <= 700
    # lambda*dt ~ 0.22 here -> converged well under the 512 default
    assert k < 512

    Ns, Nt, M = 5, 320, 3
    r = jnp.asarray(np.linspace(-3, 3, Ns))
    xg = RectilinearGrid(r, RegularSpacing(0.0, 0.05, Nt))
    k_sep = Separable(EQ().stretch(0.7), Matern52())
    fx = to_sde(GP(k_sep))(xg, 0.1)
    yg = jnp.asarray(rng.standard_normal(Ns * Nt))
    z = jnp.asarray(np.linspace(-3, 3, M))
    e1 = float(elbo(fx, yg, z, engine="steady", n_warmup=160))
    e2 = float(elbo(fx, yg, z, engine="steady"))
    np.testing.assert_allclose(e1, e2, rtol=1e-10)
    x_pr = RectilinearGrid(jnp.asarray(np.linspace(-2, 2, 3)),
                           RegularSpacing(0.0, 0.05, Nt))
    m1, v1 = approx_posterior_marginals(fx, yg, z, x_pr, engine="steady",
                                        n_warmup=160)
    m2, v2 = approx_posterior_marginals(fx, yg, z, x_pr, engine="steady")
    # different warmup splits reorder the f64 arithmetic; agreement is up
    # to the approximation contract, not bitwise
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-7)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_public_api_logpdf_steady(rng):
    """gp-level logpdf routes steady/lti without the missing-data noise
    materialisation (which would break Fill-ness), and rejects NaNs."""
    from temporalgps_tpu.gp import lti_sde as api

    x = RegularSpacing(0.0, 0.1, 600)
    fx = to_sde(GP(Matern52()))(x, 0.1)
    y = rng.standard_normal(600)
    lp_seq = float(api.logpdf(fx, y, engine="sequential"))
    lp_st = float(api.logpdf(fx, y, engine="steady", n_warmup=128))
    lp_lti = float(api.logpdf(fx, y, engine="lti"))
    np.testing.assert_allclose(lp_st, lp_seq, rtol=1e-10)
    np.testing.assert_allclose(lp_lti, lp_seq, rtol=1e-10)

    y_nan = y.copy()
    y_nan[7] = np.nan
    with pytest.raises(ValueError, match="fully-observed"):
        api.logpdf(fx, y_nan, engine="steady")


def test_nonzero_mean_logpdf_vs_sequential(rng):
    """Regression: the scalar steady filter double-subtracted the emission
    offset h (c_w already carries -K*h), so any model with a nonzero mean
    was off by thousands of nats.  Advisor finding r2 #1."""
    from temporalgps_tpu.gp import ConstMean

    x = RegularSpacing(0.0, 0.1, 448)
    fx = to_sde(GP(Matern52(), mean=ConstMean(1.5)))(x, 0.1)
    model = build_lgssm(fx)
    y = rng.standard_normal(448) + 1.5
    lp_seq = float(lg.logpdf(model, y, engine="sequential"))
    lp_st = float(lg.logpdf(model, y, engine="steady"))
    np.testing.assert_allclose(lp_st, lp_seq, rtol=1e-12)

    # the smoothed means inherit the same w-construction
    from temporalgps_tpu.models.lgssm import LGSSM
    from temporalgps_tpu.ops import steady

    post = lg.posterior(model, y, engine="sequential")
    m1, v1 = lg.marginals_diag(LGSSM(post.trans, model.emis),
                               engine="sequential")
    m2, v2 = steady.posterior_marginals_diag(model, y)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), atol=1e-8)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-8)

    # vector-emission branch (h_eff path) with a nonzero mean
    from temporalgps_tpu.space_time import RectilinearGrid, Separable

    Ns, Nt = 5, 256
    xg = RectilinearGrid(jnp.asarray(np.linspace(-2, 2, Ns)),
                         RegularSpacing(0.0, 0.05, Nt))
    fx2 = to_sde(GP(Separable(EQ(), Matern52()), mean=ConstMean(0.7)))(
        xg, 0.25)
    m2d = build_lgssm(fx2)
    y2 = rng.standard_normal((Nt, Ns)) + 0.7
    lp_seq2 = float(lg.logpdf(m2d, y2, engine="sequential"))
    lp_st2 = float(lg.logpdf(m2d, y2, engine="steady"))
    np.testing.assert_allclose(lp_st2, lp_seq2, rtol=1e-8)


def test_rand_exact_vs_sequential(rng):
    """rand_with_eps via the constant-matrix affine solve draws IDENTICAL
    samples to the sequential engine for the same key (exact, not a steady
    approximation)."""
    model, _ = _scalar_model(N=320)
    key = jax.random.PRNGKey(7)
    y_seq = lg.rand(key, model, engine="sequential")
    y_st = lg.rand(key, model, engine="steady")
    np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_seq),
                               atol=1e-10)

    # vector-emission (spatio-temporal grid) path
    from temporalgps_tpu.space_time import RectilinearGrid, Separable

    Ns, Nt = 6, 192
    xg = RectilinearGrid(jnp.asarray(np.linspace(-2, 2, Ns)),
                         RegularSpacing(0.0, 0.05, Nt))
    fx = to_sde(GP(Separable(EQ(), Matern52())))(xg, 0.25)
    m2 = build_lgssm(fx)
    y1 = lg.rand(key, m2, engine="sequential")
    y2 = lg.rand(key, m2, engine="steady")
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1), atol=1e-10)


def test_nan_under_jit_falls_back_to_block(rng):
    """Round-4 guard (VERDICT r3 #6): jitted logpdf/elbo on the fast
    time-invariant engines must degrade gracefully when NaNs appear at
    runtime — a lax.cond routes to the block engine's missing-data path
    instead of silently returning NaN."""
    from temporalgps_tpu.gp import lti_sde as api

    x = RegularSpacing(0.0, 0.1, 512)
    y = rng.standard_normal(512)
    y_nan = y.copy()
    y_nan[13] = np.nan
    y_nan[200:210] = np.nan
    fx = to_sde(GP(Matern52()))(x, 0.1)

    for engine in ("steady", "lti"):
        f = jax.jit(lambda y_, e=engine: api.logpdf(fx, y_, engine=e))
        # NaN-free traced data still takes the fast path (same value)
        np.testing.assert_allclose(
            float(f(jnp.asarray(y))),
            float(api.logpdf(fx, y, engine="sequential")),
            rtol=1e-9,
        )
        got = float(f(jnp.asarray(y_nan)))
        want = float(api.logpdf(fx, y_nan, engine="sequential"))
        assert np.isfinite(got)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    # nan_fallback=False restores the NaN-propagating contract
    f_off = jax.jit(
        lambda y_: api.logpdf(fx, y_, engine="steady", nan_fallback=False)
    )
    assert not np.isfinite(float(f_off(jnp.asarray(y_nan))))


def test_elbo_nan_under_jit_falls_back(rng):
    from temporalgps_tpu.gp import EQ
    from temporalgps_tpu.space_time import RectilinearGrid, Separable, elbo

    Ns, Nt, M = 4, 200, 3
    r = jnp.linspace(-2.0, 2.0, Ns)
    xg = RectilinearGrid(r, RegularSpacing(0.0, 0.05, Nt))
    z = jnp.linspace(-2.0, 2.0, M)
    fx = to_sde(GP(Separable(EQ().stretch(0.8), Matern52())))(xg, 0.1)
    y = rng.standard_normal(Ns * Nt)
    y_nan = y.copy()
    y_nan[::17] = np.nan

    f = jax.jit(lambda y_: elbo(fx, y_, z, engine="steady"))
    got = float(f(jnp.asarray(y_nan)))
    want = float(elbo(fx, jnp.asarray(y_nan), z, engine="block"))
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-7)

    # gradient through the fallback stays finite
    g = jax.jit(jax.grad(lambda y_: elbo(fx, y_, z, engine="steady")))(
        jnp.asarray(y_nan)
    )
    assert bool(jnp.isfinite(jnp.nansum(g)))
