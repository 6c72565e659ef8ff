"""Distributed (shard_map) engine tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import GP, Matern52, to_sde
from temporalgps_tpu.gp.lti_sde import build_lgssm
from temporalgps_tpu.models import logpdf
from temporalgps_tpu.parallel import sharded_logpdf

N = 256


def _model_and_y(rng, N=N, irregular=False):
    if irregular:
        x = np.sort(rng.uniform(0, 10, N))
    else:
        x = RegularSpacing(0.0, 0.01, N)
    fx = to_sde(GP(0.8 * Matern52()))(x, 0.2)
    model = build_lgssm(fx)
    y = rng.standard_normal(N)
    return model, jnp.asarray(y)


def test_sharded_logpdf_matches_single(rng):
    devs = jax.devices()
    assert len(devs) == 8
    mesh = Mesh(np.array(devs), ("t",))
    model, y = _model_and_y(rng)
    lp_sharded = float(jax.jit(lambda y_: sharded_logpdf(model, y_, mesh))(y))
    lp_single = float(logpdf(model, y, engine="sequential"))
    np.testing.assert_allclose(lp_sharded, lp_single, rtol=1e-9, atol=1e-9)


def test_sharded_logpdf_irregular(rng):
    mesh = Mesh(np.array(jax.devices()), ("t",))
    model, y = _model_and_y(rng, irregular=True)
    lp_sharded = float(jax.jit(lambda y_: sharded_logpdf(model, y_, mesh))(y))
    lp_single = float(logpdf(model, y, engine="sequential"))
    np.testing.assert_allclose(lp_sharded, lp_single, rtol=1e-9, atol=1e-9)


def test_sharded_logpdf_dp_batch(rng):
    devs = np.array(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "t"))
    model, _ = _model_and_y(rng)
    ys = jnp.asarray(rng.standard_normal((4, N)))
    lp = float(jax.jit(
        lambda ys_: sharded_logpdf(model, ys_, mesh, batch_axis="dp")
    )(ys))
    want = sum(float(logpdf(model, ys[i], engine="sequential")) for i in range(4))
    np.testing.assert_allclose(lp, want, rtol=1e-9, atol=1e-8)


def test_sharded_logpdf_grad(rng):
    """Gradient flows through the distributed filter."""
    mesh = Mesh(np.array(jax.devices()), ("t",))
    x = RegularSpacing(0.0, 0.01, N)
    y = jnp.asarray(rng.standard_normal(N))

    def loss(log_s2):
        fx = to_sde(GP(jnp.exp(log_s2) * Matern52()))(x, 0.2)
        return -sharded_logpdf(build_lgssm(fx), y, mesh)

    # NB grad-of-shard_map must run under jit (eager transpose trips an XLA
    # sharding assertion in jax 0.9); jit is the only realistic usage anyway.
    g = jax.jit(jax.grad(loss))(jnp.asarray(0.0))
    assert np.isfinite(float(g))

    def loss_single(log_s2):
        fx = to_sde(GP(jnp.exp(log_s2) * Matern52()))(x, 0.2)
        return -logpdf(build_lgssm(fx), y, engine="sequential")

    g_single = jax.grad(loss_single)(jnp.asarray(0.0))
    np.testing.assert_allclose(float(g), float(g_single), rtol=1e-7)


def test_sharded_logpdf_fwd_grad(rng):
    """Forward-mode (vmapped JVP) gradients through the distributed filter."""
    from temporalgps_tpu.learning import value_and_grad_fwd

    mesh = Mesh(np.array(jax.devices()), ("t",))
    x = RegularSpacing(0.0, 0.01, N)
    y = jnp.asarray(rng.standard_normal(N))

    def loss(p):
        fx = to_sde(GP(jnp.exp(p) * Matern52()))(x, 0.2)
        return -sharded_logpdf(build_lgssm(fx), y, mesh)

    v, g = jax.jit(lambda p: value_and_grad_fwd(loss)(p))(jnp.asarray(0.1))
    v2, g2 = jax.jit(jax.value_and_grad(loss))(jnp.asarray(0.1))
    np.testing.assert_allclose(float(v), float(v2), rtol=1e-10)
    np.testing.assert_allclose(float(g), float(g2), rtol=1e-8)


def test_sharded_posterior_marginals_matches_single(rng):
    """Distributed RTS smoother == single-device posterior marginals_diag."""
    from temporalgps_tpu.models import lgssm as lg
    from temporalgps_tpu.parallel import sharded_posterior_marginals

    mesh = Mesh(np.array(jax.devices()), ("t",))
    model, y = _model_and_y(rng)
    mean_sh, var_sh = jax.jit(
        lambda y_: sharded_posterior_marginals(model, y_, mesh)
    )(y)
    post = lg.posterior(model, y, engine="sequential")
    mref, vref = lg.marginals_diag(post, engine="sequential")
    np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_sh), np.asarray(vref), atol=1e-9)


def test_sharded_posterior_marginals_irregular(rng):
    from temporalgps_tpu.models import lgssm as lg
    from temporalgps_tpu.parallel import sharded_posterior_marginals

    mesh = Mesh(np.array(jax.devices()), ("t",))
    model, y = _model_and_y(rng, irregular=True)
    mean_sh, var_sh = jax.jit(
        lambda y_: sharded_posterior_marginals(model, y_, mesh)
    )(y)
    post = lg.posterior(model, y, engine="sequential")
    mref, vref = lg.marginals_diag(post, engine="sequential")
    np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_sh), np.asarray(vref), atol=1e-9)


def test_sharded_posterior_latent_chain(rng):
    from temporalgps_tpu.models import lgssm as lg
    from temporalgps_tpu.parallel import sharded_posterior_marginals

    mesh = Mesh(np.array(jax.devices()), ("t",))
    model, y = _model_and_y(rng)
    xs = jax.jit(
        lambda y_: sharded_posterior_marginals(
            model, y_, mesh, observation_space=False
        )
    )(y)
    post = lg.posterior(model, y, engine="sequential")
    ref = lg.latent_marginals(post, engine="sequential")
    np.testing.assert_allclose(np.asarray(xs.mean), np.asarray(ref.mean), atol=1e-9)
    np.testing.assert_allclose(np.asarray(xs.cov), np.asarray(ref.cov), atol=1e-9)


def test_sharded_posterior_rand_statistics(rng):
    """Backward-simulation sampler: empirical mean/var converge to the
    smoothed emission marginals (without observation noise)."""
    from temporalgps_tpu.parallel import (
        sharded_posterior_marginals,
        sharded_posterior_rand,
    )

    mesh = Mesh(np.array(jax.devices()), ("t",))
    model, y = _model_and_y(rng)
    mean_sh, var_sh = jax.jit(
        lambda y_: sharded_posterior_marginals(model, y_, mesh)
    )(y)
    lat_var = np.asarray(var_sh) - 0.2  # _model_and_y noise
    S = 128
    ks = jax.random.split(jax.random.PRNGKey(3), S)
    samps = np.asarray(
        jax.jit(
            jax.vmap(lambda k: sharded_posterior_rand(k, model, y, mesh))
        )(ks)
    )
    assert samps.shape == (S, N)
    assert np.all(np.isfinite(samps))
    se_mean = np.sqrt(lat_var / S)
    np.testing.assert_array_less(
        np.abs(samps.mean(0) - np.asarray(mean_sh)), 5 * se_mean + 1e-12
    )
    se_var = lat_var * np.sqrt(2.0 / (S - 1))
    np.testing.assert_array_less(
        np.abs(samps.var(0, ddof=1) - lat_var), 6 * se_var + 1e-12
    )


def test_sharded_logpdf_spacetime_vector_emissions(rng):
    """Distributed filter over a time-sharded spatio-temporal grid model
    (DenseEmissions, D = Ns*Dt): vector emissions ride the same chunk
    machinery as scalar series."""
    from temporalgps_tpu.gp import EQ
    from temporalgps_tpu.gp import lti_sde as api
    from temporalgps_tpu.models import lgssm as lg
    from temporalgps_tpu.space_time import RectilinearGrid, Separable

    ns, nt = 10, 64
    r = jnp.asarray(np.linspace(-2, 2, ns))
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.05, nt))
    from temporalgps_tpu.gp import to_sde as _to_sde

    fx = _to_sde(GP(Separable(EQ(), Matern52())))(x, 0.25)
    model = api.build_lgssm(fx)
    y_tf = jnp.asarray(rng.standard_normal((nt, ns)))
    mesh = Mesh(np.array(jax.devices()), ("t",))
    lp_sh = float(jax.jit(lambda y_: sharded_logpdf(model, y_, mesh))(y_tf))
    lp_1 = float(lg.logpdf(model, y_tf, engine="sequential"))
    np.testing.assert_allclose(lp_sh, lp_1, rtol=1e-9)


def _spacetime_model(rng, ns=10, nt=64, dtc=False):
    from temporalgps_tpu.gp import EQ
    from temporalgps_tpu.gp import lti_sde as api
    from temporalgps_tpu.gp import to_sde as _to_sde
    from temporalgps_tpu.space_time import RectilinearGrid, Separable

    r = jnp.asarray(np.linspace(-2, 2, ns))
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.05, nt))
    fx = _to_sde(GP(Separable(EQ(), Matern52())))(x, 0.25)
    if dtc:
        from temporalgps_tpu.space_time import dtcify

        fx = dtcify(jnp.asarray(np.linspace(-2, 2, 4)), fx)
    model = api.build_lgssm(fx)
    y_tf = jnp.asarray(rng.standard_normal((nt, ns)))
    return model, y_tf


@pytest.mark.parametrize("dtc", [False, True], ids=["dense", "bottleneck"])
def test_sharded_posterior_marginals_vector_emissions(rng, dtc):
    """Distributed RTS smoother over a spatio-temporal grid model (Dense /
    Bottleneck emissions) == single-device posterior marginals_diag."""
    from temporalgps_tpu.models import lgssm as lg
    from temporalgps_tpu.parallel import sharded_posterior_marginals

    mesh = Mesh(np.array(jax.devices()), ("t",))
    model, y_tf = _spacetime_model(rng, dtc=dtc)
    mean_sh, var_sh = jax.jit(
        lambda y_: sharded_posterior_marginals(model, y_, mesh)
    )(y_tf)
    post = lg.posterior(model, y_tf, engine="sequential")
    mref, vref = lg.marginals_diag(post, engine="sequential")
    np.testing.assert_allclose(np.asarray(mean_sh), np.asarray(mref), atol=1e-8)
    np.testing.assert_allclose(np.asarray(var_sh), np.asarray(vref), atol=1e-8)


def test_sharded_posterior_rand_vector_emissions(rng):
    """Distributed posterior sampler over a grid model: sample moments match
    the smoothed emission-mean marginals (noiseless H x + h)."""
    from temporalgps_tpu.models import lgssm as lg
    from temporalgps_tpu.parallel import sharded_posterior_rand

    mesh = Mesh(np.array(jax.devices()), ("t",))
    model, y_tf = _spacetime_model(rng, ns=6, nt=32)
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    samp = jax.jit(
        jax.vmap(lambda k: sharded_posterior_rand(k, model, y_tf, mesh))
    )(keys)
    assert samp.shape == (200, 32, 6)
    post = lg.posterior(model, y_tf, engine="sequential")
    xs = lg.latent_marginals(post, engine="sequential")
    from temporalgps_tpu.utils.fill import tmaterialize
    from temporalgps_tpu.parallel.sharded import _emission_mean

    emis_b = tmaterialize(model.emis)
    mean_ref = _emission_mean(emis_b, xs.mean)
    np.testing.assert_allclose(
        np.asarray(samp.mean(0)), np.asarray(mean_ref), atol=0.2
    )


# ---------------------------------------------------------------- steady ----


def _steady_model(rng, N=512, dt=0.2, mean=None):
    from temporalgps_tpu.gp import ConstMean

    x = RegularSpacing(0.0, dt, N)
    kw = {} if mean is None else dict(mean=ConstMean(mean))
    fx = to_sde(GP(0.8 * Matern52(), **kw))(x, 0.2)
    model = build_lgssm(fx)
    y = rng.standard_normal(N) + (mean or 0.0)
    return model, jnp.asarray(y)


def test_sharded_steady_logpdf_matches_single(rng):
    """Distributed steady lml == single-device steady == sequential.

    Includes a nonzero-mean model: regression for the h double-subtraction
    bug (advisor r2 #2) shared with ops/steady."""
    from temporalgps_tpu.ops import steady
    from temporalgps_tpu.parallel import sharded_steady_logpdf

    mesh = Mesh(np.array(jax.devices()), ("t",))
    for mean in (None, 1.5):
        model, y = _steady_model(rng, mean=mean)
        lp_sh = float(jax.jit(
            lambda y_: sharded_steady_logpdf(model, y_, mesh, n_warmup=24)
        )(y))
        lp_st = float(steady.logpdf(model, y, n_warmup=24))
        lp_seq = float(logpdf(model, y, engine="sequential"))
        np.testing.assert_allclose(lp_sh, lp_st, rtol=1e-11)
        np.testing.assert_allclose(lp_sh, lp_seq, rtol=1e-11)


def test_sharded_steady_logpdf_vector_emissions(rng):
    """Distributed steady lml over a spatio-temporal grid model (vector
    emissions, nonzero mean -> nonzero h_eff) == sequential."""
    from temporalgps_tpu.gp import ConstMean, EQ
    from temporalgps_tpu.gp import lti_sde as api
    from temporalgps_tpu.parallel import sharded_steady_logpdf
    from temporalgps_tpu.space_time import RectilinearGrid, Separable

    ns, nt = 6, 256
    r = jnp.asarray(np.linspace(-2, 2, ns))
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.25, nt))
    fx = to_sde(GP(Separable(EQ(), Matern52()), mean=ConstMean(0.7)))(x, 0.25)
    model = api.build_lgssm(fx)
    y_tf = jnp.asarray(rng.standard_normal((nt, ns)) + 0.7)
    mesh = Mesh(np.array(jax.devices()), ("t",))
    lp_sh = float(jax.jit(
        lambda y_: sharded_steady_logpdf(model, y_, mesh, n_warmup=16)
    )(y_tf))
    lp_seq = float(logpdf(model, y_tf, engine="sequential"))
    np.testing.assert_allclose(lp_sh, lp_seq, rtol=1e-10)


def test_sharded_steady_logpdf_grad(rng):
    """Reverse-mode hyperparameter gradient through the distributed steady
    lml (shard_map under jit) matches the sequential gradient."""
    from temporalgps_tpu.parallel import sharded_steady_logpdf

    mesh = Mesh(np.array(jax.devices()), ("t",))
    x = RegularSpacing(0.0, 0.2, N)
    y = jnp.asarray(rng.standard_normal(N))

    def loss(p, engine):
        fx = to_sde(GP(jnp.exp(p[0]) * Matern52()))(x, jnp.exp(p[1]))
        model = build_lgssm(fx)
        if engine == "sharded":
            return -sharded_steady_logpdf(model, y, mesh, n_warmup=24)
        return -logpdf(model, y, engine=engine)

    p0 = jnp.asarray([0.1, -1.0])
    v, g = jax.jit(jax.value_and_grad(lambda p: loss(p, "sharded")))(p0)
    v2, g2 = jax.jit(jax.value_and_grad(lambda p: loss(p, "sequential")))(p0)
    np.testing.assert_allclose(float(v), float(v2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-7)


def _dtc_setup(rng, Ns=4, Nt=240, M=3, nan=False):
    from temporalgps_tpu.gp import EQ
    from temporalgps_tpu.space_time import RectilinearGrid, Separable

    r = jnp.linspace(-2.0, 2.0, Ns)
    xg = RectilinearGrid(r, RegularSpacing(0.0, 0.05, Nt))
    z = jnp.linspace(-2.0, 2.0, M)
    fx = to_sde(GP(0.9 * Separable(EQ().stretch(0.8), Matern52())))(xg, 0.1)
    y = rng.standard_normal(Ns * Nt)
    if nan:
        y[::13] = np.nan
    return fx, jnp.asarray(y), z


@pytest.mark.parametrize("nan", [False, True])
def test_sharded_elbo_matches_single(rng, nan):
    from temporalgps_tpu.parallel import sharded_elbo
    from temporalgps_tpu.space_time import elbo

    fx, y, z = _dtc_setup(rng, nan=nan)
    mesh = Mesh(np.array(jax.devices()), ("t",))
    got = float(jax.jit(lambda y_: sharded_elbo(fx, y_, z, mesh))(y))
    want = float(elbo(fx, y, z, engine="block"))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_sharded_elbo_grad_matches_single(rng):
    from temporalgps_tpu.parallel import sharded_elbo
    from temporalgps_tpu.space_time import elbo

    fx, y, z = _dtc_setup(rng, Nt=160)
    mesh = Mesh(np.array(jax.devices()), ("t",))

    def obj_sharded(ly):
        from temporalgps_tpu.gp import EQ
        from temporalgps_tpu.space_time import RectilinearGrid, Separable

        s2 = jnp.exp(ly)
        fx2 = to_sde(GP(s2 * Separable(EQ().stretch(0.8), Matern52())))(
            fx.x, 0.1
        )
        return sharded_elbo(fx2, y, z, mesh)

    def obj_single(ly):
        from temporalgps_tpu.gp import EQ
        from temporalgps_tpu.space_time import RectilinearGrid, Separable

        s2 = jnp.exp(ly)
        fx2 = to_sde(GP(s2 * Separable(EQ().stretch(0.8), Matern52())))(
            fx.x, 0.1
        )
        return elbo(fx2, y, z, engine="block")

    p = jnp.asarray(0.3)
    v_s, g_s = jax.jit(jax.value_and_grad(obj_sharded))(p)
    v_1, g_1 = jax.jit(jax.value_and_grad(obj_single))(p)
    np.testing.assert_allclose(float(v_s), float(v_1), rtol=1e-8)
    np.testing.assert_allclose(float(g_s), float(g_1), rtol=1e-6)


def test_sharded_logpdf_basis_matches_single(rng):
    """Distributed basis-marginalised lml (det-block sum kernel) == the
    single-device basis/steady engine, value AND reverse-mode gradient."""
    from temporalgps_tpu.gp import ApproxPeriodic
    from temporalgps_tpu.gp import lti_sde as api
    from temporalgps_tpu.parallel import sharded_logpdf_basis

    mesh = Mesh(np.array(jax.devices()), ("t",))
    N2 = 1024
    x = RegularSpacing(0.0, 0.05, N2)
    y = jnp.asarray(rng.standard_normal(N2))

    def loss(p, which):
        fx = to_sde(
            GP(jnp.exp(p[0]) * Matern52() + 0.3 * ApproxPeriodic(0.5))
        )(x, jnp.exp(p[1]))
        if which == "sharded":
            return sharded_logpdf_basis(fx, y, mesh, n_warmup=64)
        return api.logpdf(fx, y, engine="basis", sub_engine=which,
                          n_warmup=64, nan_fallback=False)

    p0 = jnp.asarray([0.1, -1.0])
    v_sh, g_sh = jax.jit(jax.value_and_grad(lambda p: loss(p, "sharded")))(p0)
    v_st, g_st = jax.jit(jax.value_and_grad(lambda p: loss(p, "steady")))(p0)
    v_sq = float(jax.jit(lambda p: loss(p, "sequential"))(p0))
    np.testing.assert_allclose(float(v_sh), float(v_st), rtol=1e-10)
    np.testing.assert_allclose(float(v_sh), v_sq, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_st),
                               rtol=1e-6, atol=1e-9)


def test_sharded_logpdf_basis_no_det_fallback(rng):
    """A det-free kernel routes to sharded_steady_logpdf."""
    from temporalgps_tpu.parallel import sharded_logpdf_basis

    mesh = Mesh(np.array(jax.devices()), ("t",))
    x = RegularSpacing(0.0, 0.2, N)
    y = jnp.asarray(rng.standard_normal(N))
    fx = to_sde(GP(0.8 * Matern52()))(x, 0.2)
    lp = float(jax.jit(
        lambda y_: sharded_logpdf_basis(fx, y_, mesh, n_warmup=24))(y))
    model = build_lgssm(fx)
    lp_seq = float(logpdf(model, y, engine="sequential"))
    np.testing.assert_allclose(lp, lp_seq, rtol=1e-10)
