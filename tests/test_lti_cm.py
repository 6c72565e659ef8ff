"""Component-major lti pipeline (ops/lti_cm.py) vs sequential ground truth.

Engine-equivalence backbone: the cm layout must reproduce the row-layout
lti engine bit-for-bit in exact arithmetic (same jittered congruence math),
and both must match the sequential scan. Plus cm-primitive unit checks
(ops/cm.py) and AD-rule checks (custom JVPs on chol/tri_solve).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import (GP, ApproxPeriodic, ArrayStorage, Matern12,
                                Matern32, Matern52, to_sde)
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.models import lgssm as lg
from temporalgps_tpu.ops import cm, lti, lti_cm


def _model(dt, N, kernel=None, dt_step=0.05, noise=0.2):
    k = kernel if kernel is not None else (
        Matern52().stretch(0.8) * 2.0
        + Matern12().stretch(4.0) * 0.5
        + ApproxPeriodic(0.9, n_cos=2).stretch(1.2) * 1.0
    )
    x = RegularSpacing(jnp.asarray(0.0, dt), jnp.asarray(dt_step, dt), N)
    fx = to_sde(GP(k), ArrayStorage(dt))(x, jnp.asarray(noise, dt))
    return api.build_lgssm(fx)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def test_cm_primitives(rng):
    D, B, L = 5, 3, 4
    A = jnp.asarray(rng.standard_normal((D, D, B, 1)))
    Bm = jnp.asarray(rng.standard_normal((D, D, 1, L)))
    out = cm.mm(A, Bm)
    ref = np.einsum("ikbo,kjol->ijbl", np.asarray(A), np.asarray(Bm))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-14)

    P0 = rng.standard_normal((B, L, D, D))
    P0 = P0 @ P0.transpose(0, 1, 3, 2) + 3 * np.eye(D)
    Pcm = cm.mat_to_cm(jnp.asarray(P0))
    Lc = cm.chol(Pcm)
    np.testing.assert_allclose(
        np.asarray(cm.mat_from_cm(Lc)), np.linalg.cholesky(P0), atol=1e-12
    )

    rhs = jnp.asarray(rng.standard_normal((D, D + 2, B, L)))
    got = cm.chol_solve(Lc, rhs)
    ref = np.linalg.solve(P0, np.asarray(rhs).transpose(2, 3, 0, 1))
    np.testing.assert_allclose(
        np.asarray(got).transpose(2, 3, 0, 1), ref, atol=1e-12
    )

    # broadcast solve: L (D,D,B,1) against rhs (D,D,1,L)
    Lb = cm.chol(cm.mat_to_cm(jnp.asarray(P0[:, :1])))
    rhs2 = jnp.asarray(rng.standard_normal((D, D, 1, L)))
    got2 = cm.tri_solve(Lb, rhs2)
    ref2 = np.linalg.solve(
        np.asarray(cm.mat_from_cm(Lb)), np.asarray(rhs2).transpose(2, 3, 0, 1)
    )
    np.testing.assert_allclose(
        np.asarray(got2).transpose(2, 3, 0, 1), ref2, atol=1e-12
    )

    C = jnp.asarray(rng.standard_normal((D, D)))
    np.testing.assert_allclose(
        np.asarray(cm.mat_from_cm(cm.mm_const_left(C, Pcm))),
        np.einsum("ik,blkj->blij", np.asarray(C), P0),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(cm.mat_from_cm(cm.sandwich_const(C, Pcm))),
        np.asarray(C) @ P0 @ np.asarray(C).T,
        atol=1e-12,
    )


def test_cm_ad_rules(rng):
    """chol/tri_solve custom JVPs vs jnp.linalg reference, grad and jvp."""
    D, B = 4, 3
    P0 = rng.standard_normal((B, D, D))
    P0 = P0 @ P0.transpose(0, 2, 1) + 3 * np.eye(D)
    Pcm = cm.mat_to_cm(jnp.asarray(P0))
    v = jnp.asarray(rng.standard_normal((D, B)))

    def f_cm(P):
        L = cm.chol(cm.sym(P))
        x = cm.chol_solve(L, v)
        return jnp.sum(x * v) + jnp.sum(
            jnp.log(jnp.stack([L[i, i] for i in range(D)]))
        )

    def f_ref(Pr):
        L = jnp.linalg.cholesky(0.5 * (Pr + jnp.swapaxes(Pr, -1, -2)))
        x = jax.scipy.linalg.cho_solve((L, True), np.asarray(v).T[..., None])[
            ..., 0
        ]
        return jnp.sum(x * np.asarray(v).T) + jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1))
        )

    g_cm = jax.grad(f_cm)(Pcm)
    g_ref = jax.grad(f_ref)(jnp.asarray(P0))
    np.testing.assert_allclose(
        np.asarray(cm.mat_from_cm(g_cm)), np.asarray(g_ref), atol=1e-12
    )
    t = jnp.asarray(rng.standard_normal(Pcm.shape))
    _, jv = jax.jvp(f_cm, (Pcm,), (t,))
    _, jv_ref = jax.jvp(f_ref, (jnp.asarray(P0),), (cm.mat_from_cm(t),))
    np.testing.assert_allclose(float(jv), float(jv_ref), rtol=1e-12)


# ---------------------------------------------------------------------------
# pipeline equivalence
# ---------------------------------------------------------------------------


def test_logpdf_matches_sequential_f64(rng):
    m = _model(jnp.float64, 512)
    y = jnp.asarray(rng.standard_normal(512), jnp.float64)
    lp_seq = float(lg.logpdf(m, y, engine="sequential"))
    lp_row = float(lti._lml_from_filter(lti._filter_pass(m, y)))
    lp_cm = float(lti_cm.logpdf(m, y))
    np.testing.assert_allclose(lp_cm, lp_seq, rtol=1e-9)
    # cm must track the row layout to round-off (identical math)
    np.testing.assert_allclose(lp_cm, lp_row, rtol=1e-13)


def test_logpdf_matches_sequential_f32(rng):
    m = _model(jnp.float32, 2048)
    y = jnp.asarray(rng.standard_normal(2048), jnp.float32)
    lp_seq = float(lg.logpdf(m, y, engine="sequential"))
    lp_cm = float(lti_cm.logpdf(m, y))
    np.testing.assert_allclose(lp_cm, lp_seq, rtol=3e-4)


def test_logpdf_odd_shapes(rng):
    """Non-power-of-two N, non-default n_blocks/block_len (pad paths)."""
    m = _model(jnp.float64, 777, kernel=Matern52())
    y = jnp.asarray(rng.standard_normal(777), jnp.float64)
    lp_seq = float(lg.logpdf(m, y, engine="sequential"))
    lp_cm = float(lti_cm.logpdf(m, y, n_blocks=7, block_len=5))
    np.testing.assert_allclose(lp_cm, lp_seq, rtol=1e-10)


def test_grad_matches_sequential_f64(rng):
    dt = jnp.float64
    y = jnp.asarray(rng.standard_normal(256), dt)

    def build(ls):
        x = RegularSpacing(jnp.asarray(0.0, dt), jnp.asarray(0.05, dt), 256)
        fx = to_sde(GP(Matern52().stretch(jnp.exp(ls)) * 1.3),
                    ArrayStorage(dt))(x, jnp.asarray(0.2, dt))
        return api.build_lgssm(fx)

    g_cm = float(jax.grad(lambda s: lti_cm.logpdf(build(s), y))(
        jnp.asarray(0.0, dt)))
    g_seq = float(jax.grad(lambda s: lg.logpdf(build(s), y,
                                               engine="sequential"))(
        jnp.asarray(0.0, dt)))
    np.testing.assert_allclose(g_cm, g_seq, rtol=1e-9)


def test_affine_prefix_cm(rng):
    """Blocked Kogge-Stone affine prefix vs a plain python recursion."""
    D, N = 6, 100
    G = jnp.asarray(0.8 * np.eye(D) + 0.05 * rng.standard_normal((N, D, D)))
    w = jnp.asarray(0.1 * rng.standard_normal((N, D)))
    m0 = jnp.asarray(rng.standard_normal(D))
    got = lti_cm.affine_prefix_cm(
        cm.mat_to_cm(G), cm.vec_to_cm(w), m0, block_len=7
    )
    m = np.asarray(m0)
    ref = []
    for t in range(N):
        m = np.asarray(G)[t] @ m + np.asarray(w)[t]
        ref.append(m)
    np.testing.assert_allclose(
        np.asarray(cm.vec_from_cm(got)), np.stack(ref), atol=1e-12
    )


def test_public_dispatch_override(rng):
    """lti.CM_LAYOUT=True must route engine='lti' through the cm path on
    CPU too (same value)."""
    m = _model(jnp.float64, 128, kernel=Matern32())
    y = jnp.asarray(rng.standard_normal(128), jnp.float64)
    lp_row = float(lg.logpdf(m, y, engine="lti"))
    old = lti.CM_LAYOUT
    try:
        lti.CM_LAYOUT = True
        lp_cm = float(lg.logpdf(m, y, engine="lti"))
    finally:
        lti.CM_LAYOUT = old
    # D=2 rides the closed-form D<=4 unrolls in the row layout vs the
    # generic cm recursion — agreement to ~1e-10, not bitwise.
    np.testing.assert_allclose(lp_cm, lp_row, rtol=1e-9)
