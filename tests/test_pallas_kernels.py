"""Pallas fused-kernel path vs XLA block engine.

Interpret-mode Pallas (the only way to run these on CPU) traces extremely
slowly, so CI keeps a single minimal equivalence case; the full-size kernels
are validated on real TPU by bench.py and examples/pallas_probe.py (exact
agreement with the XLA engine, dref=0.0 at N=1e6).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import GP, Matern32, to_sde
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.ops import block


def test_pallas_logpdf_matches_xla_minimal(rng):
    N, nb = 20, 4  # includes a padded tail (20 = 4*5 exactly; use 18 for pad)
    N = 18
    fx = to_sde(GP(0.7 * Matern32()))(RegularSpacing(0.0, 0.1, N), 0.2)
    model = api.build_lgssm(fx)
    assert block._pallas_supported(model)
    y = jnp.asarray(rng.standard_normal(N))
    lp_pallas = float(block.logpdf(model, y, n_blocks=nb, pallas=True))
    lp_xla = float(block.logpdf(model, y, n_blocks=nb, pallas=False))
    np.testing.assert_allclose(lp_pallas, lp_xla, rtol=1e-10, atol=1e-10)


def test_pallas_grad_routes_through_xla(rng):
    """custom_vjp: forward = Pallas, backward = XLA autodiff."""
    N = 16
    x = RegularSpacing(0.0, 0.2, N)
    y = jnp.asarray(rng.standard_normal(N))

    def loss(p, pallas):
        kern = jnp.exp(p) * Matern32()
        model = api.build_lgssm(to_sde(GP(kern))(x, 0.3))
        return block.logpdf(model, y, n_blocks=4, pallas=pallas)

    v_p, g_p = jax.value_and_grad(lambda p: loss(p, True))(jnp.asarray(0.1))
    v_x, g_x = jax.value_and_grad(lambda p: loss(p, False))(jnp.asarray(0.1))
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-10)
    np.testing.assert_allclose(float(g_p), float(g_x), rtol=1e-8)


def test_pallas_fwd_grad_matches_autodiff(rng):
    """Fused forward-mode phases (logpdf_fwd_grad / value_and_grad_fwd_lgssm)
    == vmapped jax.jvp through the sequential engine, with every
    hyperparameter sensitivity live (kernel scale, stretch, noise -> A, Q,
    H, s, x0 tangents) and a missing observation (noise tangent masking)."""
    import jax.numpy as jnp

    from temporalgps_tpu.gp.lti_sde import logpdf as gp_logpdf
    from temporalgps_tpu.learning import value_and_grad_fwd, value_and_grad_fwd_lgssm

    N = 18
    x = RegularSpacing(0.0, 0.15, N)
    y = jnp.asarray(rng.standard_normal(N)).at[5].set(jnp.nan)

    def model_fn(p):
        s2, sc, noise = jnp.exp(p)
        fx = to_sde(GP((s2 * Matern32()).stretch(sc)))(x, noise)
        return api.build_lgssm(fx)

    def loss_ref(p):
        s2, sc, noise = jnp.exp(p)
        fx = to_sde(GP((s2 * Matern32()).stretch(sc)))(x, noise)
        return gp_logpdf(fx, y, engine="sequential")

    p0 = jnp.asarray([0.2, -0.4, 0.3])
    v_ref, g_ref = value_and_grad_fwd(loss_ref)(p0)
    v_f, g_f = value_and_grad_fwd_lgssm(model_fn, y, n_blocks=4)(p0)
    np.testing.assert_allclose(float(v_f), float(v_ref), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref), rtol=1e-7, atol=1e-10)


def test_pallas_posterior_pipeline_matches_sequential(rng):
    """Component-major posterior pipeline (_posterior_pallas +
    marginals_diag_pallas / latent_marginals_pallas) == sequential smoother."""
    from model_test_utils import random_lgssm, random_obs
    from temporalgps_tpu.models import marginals_diag, posterior
    from temporalgps_tpu.ops import block

    model = random_lgssm(
        rng, kind="scalar", D=3, Dout=1, N=21, time_varying=False, forward=True
    )
    y = random_obs(rng, model)
    post_ref = posterior(model, y, engine="sequential")
    m_ref, v_ref = marginals_diag(post_ref, engine="sequential")

    post_p = block._posterior_pallas(model, y, n_blocks=4)
    m_p, v_p = marginals_diag(post_p, engine="sequential")
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_ref), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_ref), rtol=1e-6, atol=1e-9)

    # smoothing pass through the affine Pallas pipeline on the reference post
    m_a, v_a = block.marginals_diag_pallas(post_ref, n_blocks=4)
    np.testing.assert_allclose(np.asarray(m_a), np.asarray(m_ref), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_ref), rtol=1e-6, atol=1e-9)

    # latent marginals (prior, forward model) through the affine pipeline
    from temporalgps_tpu.models import latent_marginals

    xs_ref = latent_marginals(model, engine="sequential")
    xs_p = block.latent_marginals_pallas(model, n_blocks=4)
    np.testing.assert_allclose(
        np.asarray(xs_p.mean), np.asarray(xs_ref.mean), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(xs_p.cov), np.asarray(xs_ref.cov), rtol=1e-6, atol=1e-9
    )
