"""Fisher-identity gradients vs autodiff through the sequential engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from model_test_utils import random_lgssm, random_obs
from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import GP, Matern32, Matern52, to_sde
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.models import logpdf
from temporalgps_tpu.ops.fisher import logpdf_fisher


def canon(x):
    x = np.asarray(x)
    if x.ndim >= 2 and x.shape[-1] == x.shape[-2]:
        return 0.5 * (x + np.swapaxes(x, -1, -2))
    return x


@pytest.mark.parametrize("time_varying", [True, False])
def test_model_cotangents_match_autodiff(rng, time_varying):
    model = random_lgssm(
        rng, kind="scalar", D=3, Dout=1, N=16, time_varying=time_varying
    )
    y = random_obs(rng, model)

    v_f, grads_f = jax.value_and_grad(lambda m, yy: logpdf_fisher(m, yy), argnums=(0, 1))(
        model, jnp.asarray(y)
    )
    v_a, grads_a = jax.value_and_grad(
        lambda m, yy: logpdf(m, yy, engine="sequential"), argnums=(0, 1)
    )(model, jnp.asarray(y))

    np.testing.assert_allclose(float(v_f), float(v_a), rtol=1e-9)
    leaves_f = jax.tree_util.tree_leaves(grads_f)
    leaves_a = jax.tree_util.tree_leaves(grads_a)
    assert len(leaves_f) == len(leaves_a)
    for lf, la in zip(leaves_f, leaves_a):
        np.testing.assert_allclose(canon(lf), canon(la), rtol=1e-6, atol=1e-8)


def test_hyperparameter_gradients_match(rng):
    """End-to-end through the kernel compiler: Fisher vs autodiff."""
    N = 200
    x = RegularSpacing(0.0, 0.9, N)
    y = jnp.asarray(rng.standard_normal(N))

    def build(p):
        s2, sc, noise = jnp.exp(p)
        kern = (s2 * Matern52()).stretch(sc)
        fx = to_sde(GP(kern))(x, noise)
        return api.build_lgssm(fx)

    def loss_fisher(p):
        return -logpdf_fisher(build(p), y)

    def loss_auto(p):
        return -logpdf(build(p), y, engine="sequential")

    p0 = jnp.asarray([0.1, -0.2, -1.0])
    v_f, g_f = jax.value_and_grad(loss_fisher)(p0)
    v_a, g_a = jax.value_and_grad(loss_auto)(p0)
    np.testing.assert_allclose(float(v_f), float(v_a), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_a), rtol=1e-6, atol=1e-8)


def test_sum_kernel_gradients_match(rng):
    """Sum of Materns: block-diagonal SPD Q — still Fisher-eligible."""
    N = 64
    x = np.sort(rng.uniform(0, 5, N))
    y = jnp.asarray(rng.standard_normal(N))

    def build(p):
        kern = jnp.exp(p[0]) * Matern32() + jnp.exp(p[1]) * Matern52()
        return api.build_lgssm(to_sde(GP(kern))(x, 0.3))

    g_f = jax.grad(lambda p: logpdf_fisher(build(p), y))(jnp.zeros(2))
    g_a = jax.grad(lambda p: logpdf(build(p), y, engine="sequential"))(jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_a), rtol=1e-6, atol=1e-8)


def test_small_lamdt_conditioning_fixed(rng):
    """Round-3 innovations-form rewrite: gradient accuracy must be flat in
    lam*dt (the old Q^{-1}-contraction form lost ~5 digits per decade and
    was unusable below lam*dt ~ 0.1).  Residual error at extreme
    oversampling is cond(P_pred)*eps from the materialised smoother
    moments — f64 stays under 1e-4 even at lam*dt = 1e-3."""
    N = 256
    lam = np.sqrt(5.0)
    y = jnp.asarray(rng.standard_normal(N))
    p0 = jnp.asarray([0.1, -0.2, -1.0])
    for lamdt, tol in ((1e-3, 1e-4), (1e-2, 1e-5), (1e-1, 1e-6), (1.0, 1e-7)):
        dt = lamdt / lam
        x = RegularSpacing(0.0, dt, N)

        def build(p):
            s2, sc, noise = jnp.exp(p)
            return api.build_lgssm(
                to_sde(GP((s2 * Matern52()).stretch(sc)))(x, noise))

        g_f = jax.grad(lambda p: logpdf_fisher(build(p), y))(p0)
        g_a = jax.grad(lambda p: logpdf(build(p), y, engine="sequential"))(p0)
        rel = float(np.max(np.abs(g_f - g_a) / (np.abs(g_a) + 1e-12)))
        assert rel < tol, (lamdt, rel)


def test_value_and_grad_fisher_k10(rng):
    """learning.value_and_grad_fisher: k=10 hyperparameters, cost O(1) in k
    (the VERDICT round-2 learning-story criterion), matches forward-mode
    autodiff through the sequential engine."""
    from temporalgps_tpu.gp import Matern12
    from temporalgps_tpu.learning import value_and_grad_fisher, value_and_grad_fwd

    N = 128
    x = RegularSpacing(0.0, 0.25, N)
    y = jnp.asarray(rng.standard_normal(N))

    def model_fn(p):
        kern = (
            (jnp.exp(p[0]) * Matern52()).stretch(jnp.exp(p[1]))
            + (jnp.exp(p[2]) * Matern32()).stretch(jnp.exp(p[3]))
            + (jnp.exp(p[4]) * Matern12()).stretch(jnp.exp(p[5]))
            + (jnp.exp(p[6]) * Matern52()).stretch(jnp.exp(p[7]))
            + (jnp.exp(p[8]) * Matern32()).stretch(jnp.exp(p[9]))
        )
        fx = to_sde(GP(kern))(x, 0.3)
        return api.build_lgssm(fx)

    p0 = jnp.asarray([0.1, -0.2, 0.0, 0.4, -0.3, 0.2, 0.15, -0.1, 0.05, 0.3])
    v_f, g_f = value_and_grad_fisher(model_fn, y)(p0)
    v_a, g_a = value_and_grad_fwd(
        lambda p: logpdf(model_fn(p), y, engine="sequential"))(p0)
    np.testing.assert_allclose(float(v_f), float(v_a), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_a),
                               rtol=1e-6, atol=1e-8)


def test_det_block_gradients_match(rng):
    """Deterministic blocks (Q = 0): the innovations form is Koopman's exact
    score, valid for semi-definite Q — no EM complete-data density needed
    (see ops/fisher.py docstring; probes/fisher_detblock_probe.py for the
    N-scaling)."""
    from temporalgps_tpu.gp import ApproxPeriodic

    N = 128
    x = RegularSpacing(0.0, 0.05, N)
    y = jnp.asarray(rng.standard_normal(N))

    def build(p):
        s2, sc, noise = jnp.exp(p)
        kern = s2 * Matern52() + 0.3 * ApproxPeriodic(sc, n_cos=2)
        return api.build_lgssm(to_sde(GP(kern))(x, noise))

    p0 = jnp.asarray([0.1, -0.5, -1.5])
    g_f = jax.grad(lambda p: logpdf_fisher(build(p), y))(p0)
    g_a = jax.grad(lambda p: logpdf(build(p), y, engine="sequential"))(p0)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_a), rtol=1e-4)
