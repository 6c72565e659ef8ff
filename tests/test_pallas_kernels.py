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
