"""Spatio-temporal layer tests: exact separable inference vs dense oracle,
DTC/ELBO vs dense Titsias formulas
(reference: test/space_time/to_gauss_markov.jl, pseudo_point.jl)."""

import numpy as np
import pytest

import jax.numpy as jnp

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import EQ, GP, Matern32, Matern52, to_sde
from temporalgps_tpu.gp import logpdf, marginals, rand
from temporalgps_tpu.space_time import (
    RectilinearGrid,
    Separable,
    approx_posterior_marginals,
    dtc,
    elbo,
    regular_in_time,
)
from temporalgps_tpu.space_time.separable import gram_grid

NS, NT = 4, 6


def _grid_setup(rng, regular=True):
    xl = np.sort(rng.uniform(-2.0, 2.0, NS))
    xr = RegularSpacing(0.0, 0.4, NT) if regular else np.sort(rng.uniform(0, 3, NT))
    k = Separable(EQ(), Matern32())
    f = to_sde(GP(k))
    x = RectilinearGrid(jnp.asarray(xl), xr)
    noise = 0.25 + rng.random(NS * NT) * 0.1
    return f, x, noise, k


def _dense_logpdf(C, y):
    L = np.linalg.cholesky(C)
    a = np.linalg.solve(L, y)
    return -0.5 * (len(y) * np.log(2 * np.pi) + 2 * np.sum(np.log(np.diag(L))) + a @ a)


@pytest.mark.parametrize("regular", [True, False])
def test_exact_spacetime_vs_dense(rng, regular):
    f, x, noise, k = _grid_setup(rng, regular)
    fx = f(x, noise)
    Kmat = np.asarray(gram_grid(k, x)) + np.diag(noise)
    y = rng.standard_normal(NS * NT)

    lp = float(logpdf(fx, y))
    np.testing.assert_allclose(lp, _dense_logpdf(Kmat, y), rtol=1e-7, atol=1e-7)

    m, v = marginals(fx)
    np.testing.assert_allclose(np.asarray(m), np.zeros(NS * NT), atol=1e-9)
    np.testing.assert_allclose(np.asarray(v), np.diag(Kmat), rtol=1e-7, atol=1e-8)


def test_exact_spacetime_scaled_sum(rng):
    """Scaled and Sum combinators over Separable kernels."""
    xl = np.sort(rng.uniform(-2.0, 2.0, NS))
    x = RectilinearGrid(jnp.asarray(xl), RegularSpacing(0.0, 0.4, NT))
    k = 0.7 * Separable(EQ(), Matern32()) + 0.3 * Separable(EQ(), Matern52())
    f = to_sde(GP(k))
    noise = 0.3
    fx = f(x, noise)
    Kmat = (
        0.7 * np.asarray(gram_grid(Separable(EQ(), Matern32()), x))
        + 0.3 * np.asarray(gram_grid(Separable(EQ(), Matern52()), x))
        + noise * np.eye(NS * NT)
    )
    y = rng.standard_normal(NS * NT)
    np.testing.assert_allclose(float(logpdf(fx, y)), _dense_logpdf(Kmat, y), rtol=1e-7)
    m, v = marginals(fx)
    np.testing.assert_allclose(np.asarray(v), np.diag(Kmat), rtol=1e-7, atol=1e-8)


def test_exact_spacetime_engines_match(rng):
    f, x, noise, k = _grid_setup(rng)
    fx = f(x, noise)
    y = rng.standard_normal(NS * NT)
    lp_seq = float(logpdf(fx, y, engine="sequential"))
    lp_par = float(logpdf(fx, y, engine="parallel"))
    np.testing.assert_allclose(lp_par, lp_seq, rtol=1e-9)


def test_exact_spacetime_engines_f32_big_grid(rng):
    """Regression: f32 + big spatial grid (D = Ns*Dt = 60, Dout = 20 > 4).

    Covers two historical failures: (a) psd.tri_solve's LAPACK fallback did
    not broadcast block-batched L against Fill-derived unbatched rhs, and
    (b) assoc._minv's fixed 1e-10 jitter was below f32 round-off for
    ill-conditioned Kr (x) P_inf covariances, NaN-ing parallel/block engines.
    """
    from temporalgps_tpu.gp import ArrayStorage
    from temporalgps_tpu.gp import lti_sde as api
    from temporalgps_tpu.models import lgssm as lg

    dtype = jnp.float32
    ns, nt = 20, 50
    r = jnp.asarray(np.linspace(-3, 3, ns), dtype)
    x = RectilinearGrid(
        r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), nt)
    )
    k = Separable(EQ().stretch(0.7), Matern52())
    fx = to_sde(GP(k), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    model = api.build_lgssm(fx)
    y = jnp.asarray(rng.standard_normal((nt, ns)), dtype)
    lp_seq = float(lg.logpdf(model, y, engine="sequential"))
    # n_blocks=7 does not divide nt: exercises the padded-tail schedule.
    lp_blk = float(lg.logpdf(model, y, engine="block", n_blocks=7))
    lp_par = float(lg.logpdf(model, y, engine="parallel"))
    assert np.isfinite(lp_seq)
    np.testing.assert_allclose(lp_blk, lp_seq, rtol=5e-5)
    np.testing.assert_allclose(lp_par, lp_seq, rtol=5e-4)


def test_exact_spacetime_rand(rng):
    import jax

    f, x, noise, k = _grid_setup(rng)
    fx = f(x, noise)
    ys = np.asarray(rand(jax.random.PRNGKey(0), fx))
    assert ys.shape == (NS * NT,)
    assert np.all(np.isfinite(ys))


def _dtc_dense(Kff, Kuf, Kuu, noise, y):
    """Dense DTC log-evidence: log N(y; 0, Qff + Sigma)."""
    Q = Kuf.T @ np.linalg.solve(Kuu + 1e-12 * np.eye(len(Kuu)), Kuf)
    return _dense_logpdf(Q + np.diag(noise), y)


def test_dtc_vs_dense(rng):
    f, x, noise, k = _grid_setup(rng)
    fx = f(x, noise)
    y = rng.standard_normal(NS * NT)
    z = np.sort(rng.uniform(-2.0, 2.0, 3))

    got = float(dtc(fx, y, jnp.asarray(z)))

    import temporalgps_tpu.gp.kernels as K

    t = np.asarray(x.xr.to_array())
    Kt = np.asarray(K.gram(Matern32(), t))
    Kr_uf = np.asarray(K.gram(EQ(), z, np.asarray(x.xl)))
    Kr_uu = np.asarray(K.gram(EQ(), z))
    Kuf = np.kron(Kt, Kr_uf)  # inducing replicated at each time
    Kuu = np.kron(Kt, Kr_uu)
    Kff = np.asarray(gram_grid(k, x))
    want = _dtc_dense(Kff, Kuf, Kuu, noise, y)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_dtc_with_all_inducing_equals_exact(rng):
    """With z = all spatial points, DTC == exact logpdf."""
    f, x, noise, k = _grid_setup(rng)
    fx = f(x, noise)
    y = rng.standard_normal(NS * NT)
    got = float(dtc(fx, y, x.xl))
    want = float(logpdf(fx, y))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_elbo_vs_dense(rng):
    f, x, noise, k = _grid_setup(rng)
    fx = f(x, noise)
    y = rng.standard_normal(NS * NT)
    z = np.sort(rng.uniform(-2.0, 2.0, 3))
    got = float(elbo(fx, y, jnp.asarray(z)))

    import temporalgps_tpu.gp.kernels as K

    t = np.asarray(x.xr.to_array())
    Kt = np.asarray(K.gram(Matern32(), t))
    Kr_uf = np.asarray(K.gram(EQ(), z, np.asarray(x.xl)))
    Kr_uu = np.asarray(K.gram(EQ(), z))
    Kuf = np.kron(Kt, Kr_uf)
    Kuu = np.kron(Kt, Kr_uu)
    Kff = np.asarray(gram_grid(k, x))
    Q = Kuf.T @ np.linalg.solve(Kuu + 1e-12 * np.eye(len(Kuu)), Kuf)
    want = _dense_logpdf(Q + np.diag(noise), y) - 0.5 * np.sum(
        np.diag(Kff - Q) / noise
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_elbo_lower_bounds_logpdf(rng):
    f, x, noise, k = _grid_setup(rng)
    fx = f(x, noise)
    y = rng.standard_normal(NS * NT)
    z = np.sort(rng.uniform(-2.0, 2.0, 3))
    assert float(elbo(fx, y, jnp.asarray(z))) <= float(logpdf(fx, y)) + 1e-8


def test_approx_posterior_marginals_with_full_inducing(rng):
    """z = all spatial points -> DTC posterior == exact posterior."""
    f, x, noise, k = _grid_setup(rng)
    fx = f(x, noise)
    y = rng.standard_normal(NS * NT)
    m, v = approx_posterior_marginals(fx, y, x.xl, x.xl)

    # Dense exact posterior of the latent f at the same grid points.
    Kff = np.asarray(gram_grid(k, x))
    C = Kff + np.diag(noise)
    sol = np.linalg.solve(C, y)
    m_want = Kff @ sol
    cov_want = Kff - Kff @ np.linalg.solve(C, Kff)
    np.testing.assert_allclose(np.asarray(m), m_want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.diag(cov_want), rtol=1e-4, atol=1e-6)


def test_ragged_regular_in_time(rng):
    """RegularInTime (ragged) DTC: matches a RectilinearGrid when slices are
    complete, and runs finite when ragged."""
    f, x, noise, k = _grid_setup(rng)
    y = rng.standard_normal(NS * NT)
    z = np.sort(rng.uniform(-2.0, 2.0, 3))
    fx_grid = f(x, noise)

    vs = [np.asarray(x.xl) for _ in range(NT)]
    x_rit = regular_in_time(np.asarray(x.xr.to_array()), vs)
    fx_rit = f(x_rit, noise)
    lp_grid = float(dtc(fx_grid, y, jnp.asarray(z)))
    lp_rit = float(dtc(fx_rit, y, jnp.asarray(z)))
    np.testing.assert_allclose(lp_rit, lp_grid, rtol=1e-6)

    # genuinely ragged
    counts = [NS, NS - 1, NS, NS - 2, NS, NS - 1]
    vs_r = [np.asarray(x.xl)[:c] for c in counts]
    x_rag = regular_in_time(np.asarray(x.xr.to_array()), vs_r)
    n_obs = sum(counts)
    y_r = rng.standard_normal(n_obs)
    fx_rag = f(x_rag, 0.3)
    val = float(elbo(fx_rag, y_r, jnp.asarray(z)))
    assert np.isfinite(val)


def test_exact_spacetime_posterior_new_times(rng):
    """Exact grid posterior at new time points vs dense conditioning."""
    from temporalgps_tpu.gp.posterior import marginals as post_marginals
    from temporalgps_tpu.gp.posterior import posterior

    f, x, noise, k = _grid_setup(rng)
    fx = f(x, noise)
    y = rng.standard_normal(NS * NT)
    fp = posterior(fx, y)
    t_pr = np.sort(rng.uniform(0.05, 2.3, 3))
    x_pr = RectilinearGrid(x.xl, jnp.asarray(t_pr))
    m, v = post_marginals(fp(x_pr, 0.1))

    # dense oracle
    Kff = np.asarray(gram_grid(k, x)) + np.diag(noise)
    import temporalgps_tpu.gp.kernels as K

    t_tr = np.asarray(x.xr.to_array())
    Kt_pf = np.asarray(K.gram(Matern32(), t_pr, t_tr))
    Kt_pp = np.asarray(K.gram(Matern32(), t_pr))
    Kr = np.asarray(K.gram(EQ(), np.asarray(x.xl)))
    Kpf = np.kron(Kt_pf, Kr)
    Kpp = np.kron(Kt_pp, Kr) + 0.1 * np.eye(3 * NS)
    sol = np.linalg.solve(Kff, y)
    m_want = Kpf @ sol
    v_want = np.diag(Kpp - Kpf @ np.linalg.solve(Kff, Kpf.T))
    np.testing.assert_allclose(np.asarray(m), m_want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), v_want, rtol=1e-4, atol=1e-6)


def test_exact_spacetime_posterior_same_times(rng):
    from temporalgps_tpu.gp.posterior import marginals as post_marginals
    from temporalgps_tpu.gp.posterior import posterior

    f, x, noise, k = _grid_setup(rng)
    fx = f(x, noise)
    y = rng.standard_normal(NS * NT)
    fp = posterior(fx, y)
    m, v = post_marginals(fp(x, 0.05))
    Kff = np.asarray(gram_grid(k, x))
    C = Kff + np.diag(noise)
    sol = np.linalg.solve(C, y)
    m_want = Kff @ sol
    v_want = np.diag(Kff - Kff @ np.linalg.solve(C, Kff)) + 0.05
    np.testing.assert_allclose(np.asarray(m), m_want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), v_want, rtol=1e-4, atol=1e-6)


def test_approx_posterior_marginals_at_single_time(rng):
    """Single-time variant agrees with the all-times variant at that slice."""
    from temporalgps_tpu.space_time import approx_posterior_marginals_at

    f, x, noise, k = _grid_setup(rng)
    fx = f(x, noise)
    y = rng.standard_normal(NS * NT)
    z = np.sort(rng.uniform(-2.0, 2.0, 3))
    r_pr = np.sort(rng.uniform(-2.0, 2.0, 5))
    t = 3
    m_all, v_all = approx_posterior_marginals(fx, y, jnp.asarray(z), jnp.asarray(r_pr))
    m_t, v_t = approx_posterior_marginals_at(fx, y, jnp.asarray(z), jnp.asarray(r_pr), t)
    # grid vs ragged DTC paths use different K_zz jitters (1e-12 vs 1e-9,
    # both as in the reference), so agreement is ~1e-6.
    np.testing.assert_allclose(
        np.asarray(m_t), np.asarray(m_all).reshape(NT, 5)[t], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(v_t), np.asarray(v_all).reshape(NT, 5)[t], rtol=1e-5, atol=1e-6
    )


def test_kron_engine_matches_sequential(rng):
    """Factored Kronecker filter (space_time/kron.py) == materialised
    sequential engine, bit-tight in f64; covers missing data, irregular
    times, ConstMean, heteroscedastic noise."""
    from temporalgps_tpu.gp import to_sde as _to_sde
    from temporalgps_tpu.gp.means import ConstMean

    ns, nt = 8, 25
    r = jnp.asarray(np.linspace(-2, 2, ns))
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.05, nt))
    k = Separable(EQ(), Matern52())
    fx = to_sde(GP(k))(x, 0.3)
    y = rng.standard_normal(ns * nt)
    np.testing.assert_allclose(
        float(logpdf(fx, y, engine="kron")),
        float(logpdf(fx, y, engine="sequential")),
        rtol=1e-12,
    )

    y_miss = np.array(y)
    y_miss[[2, 40, 111]] = np.nan
    np.testing.assert_allclose(
        float(logpdf(fx, jnp.asarray(y_miss), engine="kron")),
        float(logpdf(fx, jnp.asarray(y_miss), engine="sequential")),
        rtol=1e-12,
    )

    x_irr = RectilinearGrid(r, jnp.asarray(np.sort(rng.uniform(0, 3, nt))))
    fx2 = to_sde(GP(k, mean=ConstMean(0.7)))(
        x_irr, jnp.asarray(0.1 + rng.random(ns * nt) * 0.2)
    )
    y2 = rng.standard_normal(ns * nt)
    np.testing.assert_allclose(
        float(logpdf(fx2, y2, engine="kron")),
        float(logpdf(fx2, y2, engine="sequential")),
        rtol=1e-11,
    )


def test_kron_engine_grad(rng):
    """Hyperparameter gradients agree between kron and sequential engines."""
    import jax as _jax

    ns, nt = 6, 20
    r = jnp.asarray(np.linspace(-2, 2, ns))
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.05, nt))
    y = rng.standard_normal(ns * nt)

    def loss(p, engine):
        s2, noise = jnp.exp(p)
        fx = to_sde(GP(s2 * Separable(EQ(), Matern52())))(x, noise)
        return logpdf(fx, y, engine=engine)

    p0 = jnp.asarray([0.3, -1.0])
    gk = _jax.grad(lambda p: loss(p, "kron"))(p0)
    gs = _jax.grad(lambda p: loss(p, "sequential"))(p0)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gs), rtol=1e-9)


def test_kron_marginals_match_sequential(rng):
    """Factored prior marginals == materialised marginals_diag (f64)."""
    ns, nt = 7, 18
    r = jnp.asarray(np.linspace(-2, 2, ns))
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.05, nt))
    fx = to_sde(GP(1.4 * Separable(EQ(), Matern52())))(
        x, jnp.asarray(0.1 + rng.random(ns * nt) * 0.2)
    )
    m_seq, v_seq = marginals(fx, engine="sequential")
    m_k, v_k = marginals(fx, engine="kron")
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_seq), atol=1e-11)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_seq), rtol=1e-11)


def test_kron_rand_moments(rng):
    """Factored grid sampling reproduces the prior marginals (moment check,
    many i.i.d. draws) and is deterministic in the key."""
    import jax as _jax

    ns, nt = 5, 12
    r = jnp.asarray(np.linspace(-1.5, 1.5, ns))
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.1, nt))
    fx = to_sde(GP(Separable(EQ(), Matern32())))(x, 0.05)
    key = _jax.random.PRNGKey(3)
    ys = rand(key, fx, n=4000, engine="kron")
    assert ys.shape == (4000, ns * nt)
    m_th, v_th = marginals(fx, engine="sequential")
    m_emp = np.mean(np.asarray(ys), axis=0)
    v_emp = np.var(np.asarray(ys), axis=0)
    np.testing.assert_allclose(m_emp, np.asarray(m_th), atol=5 * np.sqrt(np.max(v_th) / 4000) + 1e-3)
    np.testing.assert_allclose(v_emp, np.asarray(v_th), rtol=0.15)


def test_kron_posterior_marginals_match_sequential(rng):
    """Factored-filter RTS smoother (kron.posterior_marginals + the
    gp/posterior engine='kron' dispatch) == materialised sequential
    smoother: means/vars, missing data, prediction noise != training
    noise, irregular times + ConstMean."""
    from temporalgps_tpu.gp import posterior as gpp
    from temporalgps_tpu.gp.means import ConstMean

    ns, nt = 7, 23
    r = jnp.asarray(np.linspace(-2, 2, ns))
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.05, nt))
    k = Separable(EQ(), Matern52())
    fx = to_sde(GP(k))(x, 0.3)
    y = rng.standard_normal(ns * nt)
    y[[2, 40]] = np.nan
    y = jnp.asarray(y)

    post = gpp.posterior(fx, y)
    fxp = post(x, 0.07)
    m_ref, v_ref = gpp.marginals(fxp, engine="sequential")
    m_k, v_k = gpp.marginals(fxp, engine="kron")
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_ref),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=1e-7, atol=1e-8)

    # irregular times, ConstMean, heteroscedastic training noise
    x_irr = RectilinearGrid(r, jnp.asarray(np.sort(rng.uniform(0, 3, nt))))
    fx2 = to_sde(GP(k, mean=ConstMean(0.7)))(
        x_irr, jnp.asarray(0.1 + rng.random(ns * nt) * 0.2)
    )
    y2 = jnp.asarray(rng.standard_normal(ns * nt))
    post2 = gpp.posterior(fx2, y2)
    fxp2 = post2(x_irr, 0.05)
    m2_ref, v2_ref = gpp.marginals(fxp2, engine="sequential")
    m2_k, v2_k = gpp.marginals(fxp2, engine="kron")
    np.testing.assert_allclose(np.asarray(m2_k), np.asarray(m2_ref),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v2_k), np.asarray(v2_ref),
                               rtol=1e-7, atol=1e-8)


def test_kron_posterior_marginals_new_times(rng):
    """Prediction at NEW time points on the grid routes through the
    factored kron filter (merged grid: prediction slices are whole-row
    missing steps) and matches the materialised sequential path
    (reference shape family: bench/lgssm.jl:69-160)."""
    from temporalgps_tpu.gp import posterior as gpp

    ns, nt = 6, 19
    r = jnp.asarray(np.linspace(-2, 2, ns))
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.05, nt))
    k = Separable(EQ(), Matern52())
    fx = to_sde(GP(k))(x, 0.3)
    y = rng.standard_normal(ns * nt)
    y[[3, 17]] = np.nan
    y = jnp.asarray(y)
    post = gpp.posterior(fx, y)

    # new times interleaved with + extrapolating beyond the training grid
    t_new = jnp.asarray(np.concatenate([
        np.linspace(0.012, 0.71, 11),
        np.array([1.1, 1.37]),
    ]))
    x_new = RectilinearGrid(r, t_new)
    fxp = post(x_new, 0.07)
    m_ref, v_ref = gpp.marginals(fxp, engine="sequential")
    m_k, v_k = gpp.marginals(fxp, engine="kron")
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_ref),
                               rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_ref),
                               rtol=1e-7, atol=1e-8)
