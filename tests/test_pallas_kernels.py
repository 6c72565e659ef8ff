"""Pallas fused-kernel path vs XLA block engine (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import GP, Matern12, Matern32, Matern52, to_sde
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.models import lgssm as lg
from temporalgps_tpu.ops import block


# NB interpret-mode Pallas traces slowly; keep this matrix tight (TPU runs
# exercise the compiled kernels in bench/examples).
@pytest.mark.parametrize(
    "kernel,N,nb",
    [(Matern12(), 64, 8), (Matern32(), 70, 8), (Matern52(), 64, 8)],
    ids=["m12", "m32-pad", "m52"],
)
def test_pallas_logpdf_matches_xla(rng, kernel, N, nb):
    fx = to_sde(GP(0.7 * kernel))(RegularSpacing(0.0, 0.1, N), 0.2)
    model = api.build_lgssm(fx)
    assert block._pallas_supported(model)
    y = jnp.asarray(rng.standard_normal(N))
    lp_pallas = float(block.logpdf(model, y, n_blocks=nb, pallas=True))
    lp_xla = float(block.logpdf(model, y, n_blocks=nb, pallas=False))
    np.testing.assert_allclose(lp_pallas, lp_xla, rtol=1e-10, atol=1e-10)


def test_pallas_heteroscedastic_and_missing(rng):
    N = 48
    noise = 0.1 + rng.random(N)
    fx = to_sde(GP(Matern32()))(RegularSpacing(0.0, 0.1, N), noise)
    y = rng.standard_normal(N)
    y[5] = np.nan
    y[17] = np.nan
    # API path: missing fill -> (N,) noise array -> still Pallas-eligible.
    lp = float(api.logpdf(fx, jnp.asarray(y), engine="block"))
    lp_seq = float(api.logpdf(fx, jnp.asarray(y), engine="sequential"))
    np.testing.assert_allclose(lp, lp_seq, rtol=1e-8)


def test_pallas_grad_routes_through_xla(rng):
    N = 96
    x = RegularSpacing(0.0, 0.05, N)
    y = jnp.asarray(rng.standard_normal(N))

    def loss(p, pallas):
        kern = (jnp.exp(p[0]) * Matern52()).stretch(jnp.exp(p[1]))
        model = api.build_lgssm(to_sde(GP(kern))(x, 0.3))
        return block.logpdf(model, y, n_blocks=8, pallas=pallas)

    p0 = jnp.zeros(2)
    v_p, g_p = jax.value_and_grad(lambda p: loss(p, True))(p0)
    v_x, g_x = jax.value_and_grad(lambda p: loss(p, False))(p0)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-8)
