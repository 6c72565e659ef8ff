"""Basis-marginalised engine (ops/basis.py): deterministic kernel
components as marginalised Gaussian-weighted basis functions.

Ground truth: the sequential engine on the FULL state-space model (the
reference's only path for these kernels, src/gp/lti_sde.jl:239-320). The
marginalisation is exact math, so agreement is at solver precision."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import (
    GP,
    ApproxPeriodic,
    Constant,
    Cosine,
    Matern12,
    Matern32,
    Matern52,
    to_sde,
)
from temporalgps_tpu.gp import kernels as K
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.gp.means import ConstMean
from temporalgps_tpu.learning import value_and_grad_fwd

KERN_C3 = Matern52() + 0.6 * Matern32().stretch(0.5) + 0.3 * ApproxPeriodic(0.5, n_cos=3)
KERN_MIX = Matern32() + Cosine().stretch(2.0) + Constant(0.7)


def _data(N=256, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(N))


@pytest.mark.parametrize("kern", [KERN_C3, KERN_MIX], ids=["c3", "mix"])
@pytest.mark.parametrize("sub_engine", ["sequential", "block"])
def test_basis_matches_full_model(kern, sub_engine):
    N = 256
    x = RegularSpacing(0.0, 0.05, N)
    y = _data(N)
    fx = to_sde(GP(kern))(x, 0.1)
    lp_full = float(api.logpdf(fx, y, engine="sequential"))
    lp_basis = float(api.logpdf(fx, y, engine="basis", sub_engine=sub_engine))
    np.testing.assert_allclose(lp_basis, lp_full, rtol=1e-8)


def test_basis_irregular_times_and_mean():
    rng = np.random.default_rng(1)
    N = 200
    t = jnp.asarray(np.sort(rng.uniform(0.0, 15.0, N)))
    y = _data(N, 1) + 0.7
    fx = to_sde(GP(KERN_MIX, ConstMean(0.7)))(t, 0.05)
    lp_full = float(api.logpdf(fx, y, engine="sequential"))
    lp_basis = float(api.logpdf(fx, y, engine="basis"))
    np.testing.assert_allclose(lp_basis, lp_full, rtol=1e-8)


def test_basis_missing_data():
    N = 256
    x = RegularSpacing(0.0, 0.05, N)
    y = _data(N).at[::5].set(jnp.nan)
    fx = to_sde(GP(Matern52() + 0.3 * ApproxPeriodic(0.5, n_cos=2)))(x, 0.1)
    lp_full = float(api.logpdf(fx, y, engine="sequential"))
    lp_basis = float(api.logpdf(fx, y, engine="basis"))
    np.testing.assert_allclose(lp_basis, lp_full, rtol=1e-8)


def test_basis_no_det_component_passthrough():
    N = 128
    x = RegularSpacing(0.0, 0.05, N)
    y = _data(N)
    fx = to_sde(GP(Matern52()))(x, 0.1)
    lp_full = float(api.logpdf(fx, y, engine="sequential"))
    lp_basis = float(api.logpdf(fx, y, engine="basis"))
    np.testing.assert_allclose(lp_basis, lp_full, rtol=1e-10)


def test_basis_pure_deterministic_raises():
    x = RegularSpacing(0.0, 0.05, 32)
    fx = to_sde(GP(Cosine()))(x, 0.1)
    with pytest.raises(TypeError, match="stochastic"):
        api.logpdf(fx, _data(32), engine="basis")


def test_split_deterministic():
    s, d = K.split_deterministic(KERN_C3)
    assert len(s) == 2 and len(d) == 1
    # a Product with one stochastic factor is stochastic (Q = Q1 (x) P2 SPD)
    s, d = K.split_deterministic(Matern32() * Cosine())
    assert len(s) == 1 and len(d) == 0
    # all-deterministic Product is deterministic
    s, d = K.split_deterministic(Cosine() * Cosine())
    assert len(s) == 0 and len(d) == 1
    # Scaled/Stretched distribute over the split
    s, d = K.split_deterministic(2.0 * (Matern12() + Cosine()).stretch(0.5))
    assert len(s) == 1 and len(d) == 1


def test_det_basis_columns_reproduce_gram():
    """M(t) P0 M(t')' must equal the deterministic kernel's gram exactly."""
    rng = np.random.default_rng(2)
    t = jnp.asarray(np.sort(rng.uniform(0.0, 8.0, 40)))
    # n_cos=12: the Bessel-weight truncation of the cosine series is ~1e-13
    # at r=0.6, so the basis reconstruction meets the EXACT periodic gram
    # (at small n_cos both the basis and the SSM share the same truncation).
    for kern in [Cosine(), Constant(0.5), 0.4 * ApproxPeriodic(0.6, n_cos=12),
                 Cosine().stretch(1.7), Cosine() * Cosine()]:
        M, P0 = K.det_basis_columns(kern, t - t[0])
        gram_basis = np.asarray(M @ P0 @ M.T)
        gram_true = np.asarray(K.gram(kern, t))
        np.testing.assert_allclose(gram_basis, gram_true, atol=1e-9)


def test_basis_gradients_match_autodiff():
    """Hyperparameter grads through the basis engine (fwd-mode) vs autodiff
    through the full-model sequential engine."""
    N = 192
    x = RegularSpacing(0.0, 0.05, N)
    y = _data(N, 3)

    def loss(p, engine):
        s2, sc, noise = jnp.exp(p)
        kern = s2 * Matern52() + 0.3 * ApproxPeriodic(sc, n_cos=2)
        fx = to_sde(GP(kern))(x, noise)
        return api.logpdf(fx, y, engine=engine)

    p0 = jnp.asarray([0.1, -0.5, -2.0])
    v_b, g_b = jax.jit(value_and_grad_fwd(lambda p: loss(p, "basis")))(p0)
    v_s, g_s = jax.jit(jax.value_and_grad(lambda p: loss(p, "sequential")))(p0)
    np.testing.assert_allclose(float(v_b), float(v_s), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_s), rtol=1e-6)


def test_basis_steady_matches_sequential():
    """grams_steady: exact warmup + constant-gain late segment. With
    n_warmup covering the Riccati convergence (ops/steady.py contract) the
    lml and reverse-mode grads match the exact engines at f64."""
    N = 2048
    x = RegularSpacing(0.0, 0.05, N)
    y = _data(N, 7)

    def loss(p, engine, **kw):
        s2, sc, noise = jnp.exp(p)
        kern = s2 * Matern52() + 0.6 * Matern32().stretch(sc) + 0.3 * ApproxPeriodic(0.5, n_cos=3)
        fx = to_sde(GP(kern))(x, noise)
        return api.logpdf(fx, y, engine=engine, **kw)

    p0 = jnp.asarray([0.1, -0.3, -1.5])
    v_s, g_s = jax.jit(jax.value_and_grad(
        lambda p: loss(p, "basis", sub_engine="block")))(p0)
    v_t, g_t = jax.jit(jax.value_and_grad(
        lambda p: loss(p, "basis", sub_engine="steady", n_warmup=512)))(p0)
    np.testing.assert_allclose(float(v_t), float(v_s), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_s), rtol=1e-6)


def test_basis_steady_head_dtype_plumbs():
    """head_dtype overrides the warmup-head precision (ops/basis.py):
    an explicit f64 head equals the default (which resolves to f64 under
    x64), and an f32 head changes the result only at the f32 floor —
    the accuracy contract itself is measured in probes/head_dtype_check.py
    (f32 head grads 2.4e-2 off: NOT a safe default; the shipped fast path
    shrinks the f64 head via warmup tol instead)."""
    N = 1024
    x = RegularSpacing(0.0, 0.05, N)
    y = _data(N, 11)

    def lp(head_dtype):
        kern = Matern52() + 0.3 * ApproxPeriodic(0.5, n_cos=2)
        fx = to_sde(GP(kern))(x, 0.1)
        return api.logpdf(fx, y, engine="basis", sub_engine="steady",
                          n_warmup=512, head_dtype=head_dtype)

    lp_default = float(jax.jit(lambda: lp(None))())
    lp_f64 = float(jax.jit(lambda: lp(jnp.float64))())
    lp_f32 = float(jax.jit(lambda: lp(jnp.float32))())
    np.testing.assert_allclose(lp_f64, lp_default, rtol=0)
    np.testing.assert_allclose(lp_f32, lp_default, rtol=1e-4)
    assert lp_f32 != lp_default  # the override really routed


def test_basis_steady_nan_contract():
    """Concrete NaNs raise; under jit (closed-over or traced y) a lax.cond
    falls back to the exact block missing-data path."""
    N = 1024
    x = RegularSpacing(0.0, 0.05, N)
    y = _data(N, 8).at[::7].set(jnp.nan)
    fx = to_sde(GP(Matern52() + 0.3 * ApproxPeriodic(0.5, n_cos=2)))(x, 0.1)

    with pytest.raises(ValueError, match="fully-observed"):
        api.logpdf(fx, y, engine="basis", sub_engine="steady")

    # traced-y fallback: matches the exact missing-data lml
    lp_ref = float(api.logpdf(fx, y, engine="basis", sub_engine="block"))
    lp_jit = float(jax.jit(
        lambda y_: api.logpdf(fx, y_, engine="basis", sub_engine="steady",
                              n_warmup=256)
    )(y))
    np.testing.assert_allclose(lp_jit, lp_ref, rtol=1e-9)

    # closed-over concrete y under jit (binds to the ambient trace without
    # being a Tracer instance — the guard must test the reduction)
    lp_closed = float(jax.jit(
        lambda: api.logpdf(fx, y, engine="basis", sub_engine="steady",
                           n_warmup=256)
    )())
    np.testing.assert_allclose(lp_closed, lp_ref, rtol=1e-9)

    # NaN-free y through the same jitted function takes the steady branch
    y_ok = _data(N, 9)
    lp_fast = float(jax.jit(
        lambda y_: api.logpdf(fx, y_, engine="basis", sub_engine="steady",
                              n_warmup=256)
    )(y_ok))
    lp_ok = float(api.logpdf(fx, y_ok, engine="basis", sub_engine="block"))
    np.testing.assert_allclose(lp_fast, lp_ok, rtol=1e-8)


def test_basis_jit_and_no_retrace():
    N = 128
    x = RegularSpacing(0.0, 0.05, N)
    fx = to_sde(GP(KERN_MIX))(x, 0.1)
    calls = 0

    @jax.jit
    def f(y_):
        nonlocal calls
        calls += 1
        return api.logpdf(fx, y_, engine="basis")

    a = float(f(_data(N, 4)))
    b = float(f(_data(N, 5)))
    assert np.isfinite(a) and np.isfinite(b) and a != b
    assert calls == 1
