"""Square-root (QR-form) engine vs sequential ground truth.

Two pillars:
  1. Equivalence — the sqrt prefix filter must reproduce the sequential
     Kalman recursion to f64 round-off on logpdf/filter_/posterior, every
     emission kind, both orderings (same contract as the covariance-form
     parallel engine, tests/test_assoc_engine.py).
  2. Robustness — in f32 at a block count/state dim where the
     covariance-form cross-block combine produces NaN, the sqrt phase-2
     combine must stay finite and accurate (the engine's reason to exist;
     see docs/ROADMAP.md conditioning-cliff notes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from model_test_utils import random_lgssm, random_obs
from temporalgps_tpu.models import filter_, logpdf, marginals_diag, posterior

CASES = [
    dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=True),
    dict(kind="scalar", D=3, Dout=1, time_varying=False, forward=True),
    dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=False),
    dict(kind="dense", D=3, Dout=2, time_varying=True, forward=True),
    dict(kind="dense", D=3, Dout=2, time_varying=True, forward=False),
    dict(kind="large", D=2, Dout=4, time_varying=True, forward=True),
    dict(kind="bottleneck", D=3, Dout=4, time_varying=True, forward=True),
    # D > 4 exercises the eigh-based psd_root and jnp.linalg QR/cholesky.
    dict(kind="scalar", D=5, Dout=1, time_varying=True, forward=True),
    dict(kind="dense", D=6, Dout=3, time_varying=True, forward=True),
]


def _assert_gaussian_close(a, b, rtol=1e-8, atol=1e-8):
    np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean), rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov), rtol=rtol, atol=atol)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_sqrt_logpdf_filter_match(rng, case):
    model = random_lgssm(rng, N=17, **case)
    y = random_obs(rng, model)
    lp_seq = float(logpdf(model, y, engine="sequential"))
    lp_sqrt = float(logpdf(model, y, engine="sqrt"))
    np.testing.assert_allclose(lp_sqrt, lp_seq, rtol=1e-9, atol=1e-9)
    _assert_gaussian_close(
        filter_(model, y, engine="sqrt"), filter_(model, y, engine="sequential")
    )


@pytest.mark.parametrize(
    "case",
    [
        dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=True),
        dict(kind="dense", D=3, Dout=2, time_varying=True, forward=True),
        dict(kind="scalar", D=5, Dout=1, time_varying=False, forward=True),
    ],
    ids=str,
)
def test_sqrt_posterior_match(rng, case):
    model = random_lgssm(rng, N=13, **case)
    y = random_obs(rng, model)
    post_seq = posterior(model, y, engine="sequential")
    post_sqrt = posterior(model, y, engine="sqrt")
    ms, vs = marginals_diag(post_seq, engine="sequential")
    mq, vq = marginals_diag(post_sqrt, engine="sequential")
    np.testing.assert_allclose(np.asarray(mq), np.asarray(ms), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vq), np.asarray(vs), rtol=1e-7, atol=1e-8)


def test_block_phase2_sqrt_matches(rng):
    """phase2="sqrt" must be a pure re-parameterisation of the block engine."""
    model = random_lgssm(
        rng, N=40, kind="scalar", D=3, Dout=1, time_varying=True, forward=True
    )
    y = random_obs(rng, model)
    lp_cov = float(logpdf(model, y, engine="block", pallas=False, n_blocks=8))
    lp_sqrt = float(
        logpdf(model, y, engine="block", pallas=False, n_blocks=8, phase2="sqrt")
    )
    np.testing.assert_allclose(lp_sqrt, lp_cov, rtol=1e-9, atol=1e-9)


def _spacetime_f32_model(Ns, Nt):
    """The measured conditioning-cliff workload: Separable(EQ, Matern52) on
    an Ns-space x Nt-time grid, f32 (docs/ROADMAP.md)."""
    from temporalgps_tpu import RegularSpacing
    from temporalgps_tpu.gp import EQ, GP, ArrayStorage, Matern52, to_sde
    from temporalgps_tpu.gp import lti_sde as api
    from temporalgps_tpu.space_time import RectilinearGrid, Separable

    dtype = jnp.float32
    r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
    x = RectilinearGrid(
        r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt)
    )
    k = Separable(EQ().stretch(0.7), Matern52())
    fx = to_sde(GP(k), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    return api.build_lgssm(fx)


@pytest.mark.slow
def test_sqrt_phase2_survives_f32_cliff(rng):
    """At (D=36, many blocks, f32) the covariance-form combine loses PSD-ness
    while the sqrt combine must stay finite and match the f32 sequential
    recursion to f32 tolerance."""
    Ns, Nt = 12, 256  # D = 36
    model = _spacetime_f32_model(Ns, Nt)
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((Nt, Ns)), jnp.float32
    )
    lp_seq = float(logpdf(model, y, engine="sequential"))
    lp_sqrt = float(
        logpdf(model, y, engine="block", pallas=False, n_blocks=64, phase2="sqrt")
    )
    assert np.isfinite(lp_sqrt)
    # f32 agreement: the two schedules round differently; observed ~2.6e-4
    # relative on this workload (the covariance form is NaN, not 1e-3 off).
    np.testing.assert_allclose(lp_sqrt, lp_seq, rtol=1e-3)


def test_sqrt_big_d_guard(rng):
    """SQRT_MAX_D guard: public engine='sqrt' and phase2='sqrt' must refuse
    big-state models instead of reaching the batched (D, 2D) QR that
    crashed the TPU worker at D=741 (the reference's Ns=247 bench shape;
    docs/ROADMAP.md big-space notes)."""
    from temporalgps_tpu.ops import sqrt as sq

    model = _spacetime_f32_model(Ns=(sq.SQRT_MAX_D // 3) + 1, Nt=4)
    assert model.latent_dim > sq.SQRT_MAX_D
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, model.latent_dim // 3)),
        jnp.float32,
    )
    with pytest.raises(ValueError, match="square-root combine rejected"):
        logpdf(model, y, engine="sqrt")
    with pytest.raises(ValueError, match="square-root combine rejected"):
        logpdf(model, y, engine="block", pallas=False, n_blocks=2, phase2="sqrt")
