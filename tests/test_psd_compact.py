"""Unit tests for the compact (lax.scan) latency-mode factorisations in
utils/psd.py: `_chol_compact` and `_tri_solve_compact`.

These are the O(1)-traced-primitive forms the steady/lti constant-operator
chains use under `psd.latency_mode()` when the batch is thin — the Python
unrolls there produced 54k-eqn jaxprs that OOM-killed the remote TPU
compile helper at the DTC bench shape. Values, JVPs and VJPs must match
the dense references exactly (f64).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from temporalgps_tpu.utils import psd


def _rand_spd(rng, shape, D):
    A = rng.standard_normal(shape + (D, D))
    return jnp.asarray(A @ np.swapaxes(A, -1, -2) + D * np.eye(D))


def _rand_tri(rng, shape, D, lower):
    A = rng.standard_normal(shape + (D, D)) + 3.0 * np.eye(D)
    return jnp.asarray(np.tril(A) if lower else np.triu(A))


@pytest.mark.parametrize("shape", [(), (3,)])
@pytest.mark.parametrize("D", [5, 17])
def test_chol_compact_matches_dense(shape, D):
    rng = np.random.default_rng(0)
    P = _rand_spd(rng, shape, D)
    L = psd._chol_compact(P)
    np.testing.assert_allclose(L, jnp.linalg.cholesky(P), rtol=1e-12, atol=1e-12)
    # check grads through a symmetric parameterisation: cholesky's JVP uses
    # the symmetrized-tangent convention while its value reads only the
    # lower triangle, so finite-differencing an asymmetric perturbation is
    # ill-posed (jnp.linalg.cholesky itself fails raw check_grads the same
    # way). W -> W@W' + c*I keeps perturbations in the symmetric manifold.
    W = jnp.asarray(rng.standard_normal(shape + (D, D)))

    def f(W):
        return psd._chol_compact(W @ jnp.swapaxes(W, -1, -2) + D * jnp.eye(D))

    check_grads(f, (W,), order=1, modes=["fwd", "rev"], rtol=1e-6, atol=1e-7)

    # and the JVP itself against the dense rule, batched + asymmetric tangent
    dP = jnp.asarray(rng.standard_normal(P.shape))
    _, t1 = jax.jvp(psd._chol_compact, (P,), (dP,))
    _, t0 = jax.jvp(jnp.linalg.cholesky, (P,), (dP,))
    np.testing.assert_allclose(t1, t0, rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("lower", [True, False])
@pytest.mark.parametrize("trans", [True, False])
@pytest.mark.parametrize("shape_l,shape_b", [((), ()), ((3,), ()), ((), (3,))])
def test_tri_solve_compact_matches_dense(lower, trans, shape_l, shape_b):
    D, K = 7, 4
    rng = np.random.default_rng(1)
    L = _rand_tri(rng, shape_l, D, lower)
    B = jnp.asarray(rng.standard_normal(shape_b + (D, K)))
    X = psd._tri_solve_compact(L, B, lower, trans)
    base = jnp.tril(L) if lower else jnp.triu(L)
    op = jnp.swapaxes(base, -1, -2) if trans else base
    np.testing.assert_allclose(op @ X, jnp.broadcast_to(B, X.shape),
                               rtol=1e-10, atol=1e-10)
    # rev-mode tolerance is finite-difference noise-bound (~1e-6 abs on
    # O(1) entries with the default check_grads eps), not implementation
    # accuracy — the JVP check below is tight.
    check_grads(lambda l, b: psd._tri_solve_compact(l, b, lower, trans),
                (L, B), order=1, modes=["rev"], rtol=1e-4, atol=1e-5)
    check_grads(lambda l, b: psd._tri_solve_compact(l, b, lower, trans),
                (L, B), order=1, modes=["fwd"], rtol=1e-6, atol=1e-9)


def test_latency_mode_dispatches_compact_for_thin_batches():
    """Public cholesky/tri_solve inside latency_mode on a thin mid-D batch
    must produce a small jaxpr (scan-based, not O(D) unrolled) and still
    match the dense reference."""
    D = 24
    rng = np.random.default_rng(2)
    P = _rand_spd(rng, (), D)

    with psd.latency_mode():
        jaxpr = jax.make_jaxpr(psd.cholesky)(P)
        L = psd.cholesky(P)
    np.testing.assert_allclose(L, jnp.linalg.cholesky(P), rtol=1e-12, atol=1e-12)
    # the unrolled form emits O(D) eqns (hundreds at D=24); compact is O(1)
    assert len(jaxpr.eqns) < 40, len(jaxpr.eqns)

    B = jnp.asarray(rng.standard_normal((D, 3)))
    with psd.latency_mode():
        X = psd.tri_solve(L, B)
    np.testing.assert_allclose(jnp.tril(L) @ X, B, rtol=1e-10, atol=1e-10)


def test_fat_batches_keep_unrolled_path_in_latency_mode():
    """Fat batches must still take the throughput-optimal unrolled path
    even under latency_mode (it only changes the thin-batch fallback)."""
    D = 8
    rng = np.random.default_rng(3)
    P = _rand_spd(rng, (psd._UNROLL_MIN_BATCH,), D)
    with psd.latency_mode():
        L = psd.cholesky(P)
    np.testing.assert_allclose(L, jnp.linalg.cholesky(P), rtol=1e-11, atol=1e-11)
