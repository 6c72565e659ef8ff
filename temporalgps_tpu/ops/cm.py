"""Component-major (lane-dense) linear algebra for moderate state dims.

Motivation (docs/ROADMAP.md item 2c). XLA-TPU stores an array's two minor
dims padded to (8, 128) tiles, so a row-layout batch of small matrices
(N, D, D) at 4 < D <= 48 occupies ceil(D/8)*8 x 128 / D^2 of its dense
bytes — ~8.5x at D=19, ~4.5x at D=30 — and every pass over it pays that
much HBM traffic. The batched pipelines at moderate D (the lti constant
engine, the block engine's element algebra) are bandwidth-bound, so the
layout tax is the floor.

This module keeps the TIME axis minor instead: a batch of matrices is
(D, D, *batch) and a batch of vectors (D, *batch), with the large batch
dims trailing — dense lanes, zero padding. Costs move from padded MXU
batched-small-matmul tiles onto:

  * the VPU for batched-x-batched products (a python-k contraction loop of
    broadcast multiply-adds — D fused elementwise terms, no dot_general),
  * single fat MXU matmuls for constant-sided products
    ((D, D) @ (D, D*N) reshapes),

both of which touch only dense bytes. The same pattern at its extremes:
ops/lanes.py (D <= 3 scalar models) and space_time/kron.py ((Ns, Ns)
trailing tiles); this module is the generic moderate-D middle.

All functions broadcast over the trailing batch dims (numpy rules), so an
outer-product batch — a (B, 1)-batched element combined against a
(1, L)-batched one, the lti covariance pass's core step — works directly.

No reference analogue (the reference stores one matrix at a time,
e.g. src/models/lgssm.jl); this is a TPU-layout re-design.
"""

import jax
import jax.numpy as jnp

from ..config import IDENT_EPS


def mat_to_cm(X):
    """(*batch, D, D) -> (D, D, *batch), preserving (row, col) order."""
    return jnp.moveaxis(jnp.moveaxis(X, -2, 0), -1, 1)


def mat_from_cm(X):
    """(D, D, *batch) -> (*batch, D, D), preserving (row, col) order."""
    return jnp.moveaxis(jnp.moveaxis(X, 1, -1), 0, -2)


def vec_to_cm(x):
    """(*batch, D) -> (D, *batch)."""
    return jnp.moveaxis(x, -1, 0)


def vec_from_cm(x):
    """(D, *batch) -> (*batch, D)."""
    return jnp.moveaxis(x, 0, -1)


def T(A):
    """Matrix transpose in cm layout: swap the two leading (component) axes.
    A relabeling of the slowest-varying dims — lanes untouched."""
    return jnp.swapaxes(A, 0, 1)


def sym(A):
    return 0.5 * (A + T(A))


def eye(D, dtype, batch_ndim):
    return jnp.eye(D, dtype=dtype).reshape((D, D) + (1,) * batch_ndim)


def mm(A, B):
    """Matrix product in cm layout: A (Da, Dk, *b1) @ B (Dk, Db, *b2) ->
    (Da, Db, broadcast(b1, b2)). Pure VPU: Dk broadcast multiply-add terms,
    no dot_general (batched-small-matmul MXU tiles would pad)."""
    Dk = A.shape[1]
    assert B.shape[0] == Dk, (A.shape, B.shape)
    out = A[:, 0, None] * B[None, 0]
    for k in range(1, Dk):
        out = out + A[:, k, None] * B[None, k]
    return out


def mv(A, x):
    """A (Da, Dk, *b1) @ x (Dk, *b2) -> (Da, broadcast)."""
    Dk = A.shape[1]
    assert x.shape[0] == Dk, (A.shape, x.shape)
    out = A[:, 0] * x[None, 0]
    for k in range(1, Dk):
        out = out + A[:, k] * x[None, k]
    return out


def vdot(x, y):
    """sum_i x[i] * y[i] over the leading component axis."""
    return jnp.sum(x * y, axis=0)


def mm_const_left(C, X):
    """C (D, D) constant @ X (D, K, *batch) via ONE fat MXU matmul
    (D, D) @ (D, K*prod(batch)) — full-lane tiling, no VPU loop."""
    D, K = X.shape[0], X.shape[1]
    batch = X.shape[2:]
    out = C @ X.reshape(D, -1)
    return out.reshape((C.shape[0], K) + batch)


def sandwich_const(C, P):
    """C @ P @ C' for SYMMETRIC P (D, D, *batch), constant C (D, D):
    two fat MXU matmuls + a leading-axes swap ((C P)' = P C' by symmetry)."""
    T1 = mm_const_left(C, P)           # C P
    return mm_const_left(C, T(T1))     # C (C P)' = C P C'


def _chol_impl(P):
    """Lower Cholesky of P (D, D, *batch), unrolled column recursion on the
    leading component axes — every op is a dense-lane (*batch,) slice.
    Mirrors utils/psd._chol_unrolled_col in cm layout. The trailing
    Schur-complement downdate works on the shrinking (D-j-1, D-j-1, *batch)
    block, so no per-column full-matrix rebuild."""
    D = P.shape[0]
    batch = P.shape[2:]
    R = P  # running trailing block, (D-j, D-j, *batch)
    cols = []  # cols[j]: (D-j, *batch) — column j from the diagonal down
    for j in range(D):
        d = jnp.sqrt(R[0, 0])
        below = R[:, 0] / d[None]  # (D-j, *batch); below[0] = d
        cols.append(below)
        if j + 1 < D:
            R = R[1:, 1:] - below[1:, None] * below[None, 1:]
    # assemble lower-triangular (D, D, *batch)
    full = [
        jnp.concatenate(
            [jnp.zeros((j,) + batch, P.dtype), cols[j]], axis=0
        )
        for j in range(D)
    ]
    return jnp.stack(full, axis=1)


@jax.custom_jvp
def chol(P):
    """Lower Cholesky in cm layout; custom JVP keeps AD residuals at O(L)
    instead of the per-column downdate chain (cf. psd._chol_mid)."""
    return _chol_impl(P)


@chol.defjvp
def _chol_jvp(primals, tangents):
    """dL = L phi(L^{-1} dP L^{-T}), cm layout (cf. psd._chol_mid_jvp)."""
    (P,) = primals
    (dP,) = tangents
    D = P.shape[0]
    L = _chol_impl(P)
    dPs = sym(dP)
    X = tri_solve(L, T(tri_solve(L, dPs)))  # L^{-1} dPs L^{-T} (dPs sym)
    tril_half = (
        jnp.tril(jnp.ones((D, D), P.dtype), -1)
        + 0.5 * jnp.eye(D, dtype=P.dtype)
    ).reshape((D, D) + (1,) * (P.ndim - 2))
    return L, mm(L, X * tril_half)


import functools as _functools


@_functools.partial(jax.custom_jvp, nondiff_argnums=(2,))
def _tri_solve_cjvp(L, B, trans):
    return _tri_solve_impl(L, B, trans)


@_tri_solve_cjvp.defjvp
def _tri_solve_jvp(trans, primals, tangents):
    """dX = op(L)^{-1} (dB - op(dL) X) — O(X) residuals (cf.
    psd._tri_solve_mid_jvp)."""
    L, B = primals
    dL, dB = tangents
    X = _tri_solve_impl(L, B, trans)
    opdL = T(dL) if trans else dL
    if B.ndim == L.ndim:
        rhs = dB - mm(opdL, X)
    else:
        rhs = dB - mv(opdL, X)
    return X, _tri_solve_impl(L, rhs, trans)


def tri_solve(L, B, *, trans=False):
    """Solve op(L) X = B with L (D, D, *b1) lower-triangular and B carrying
    a leading D axis: (D, *b2) vector rhs or (D, K, *b2) matrix rhs (batch
    dims broadcast). Row-substitution unroll in cm layout (cf.
    utils/psd._tri_solve_rows); custom JVP for O(X) AD residuals."""
    return _tri_solve_cjvp(L, B, trans)


def _tri_solve_impl(L, B, trans):
    D = L.shape[0]
    # Callers pass either (D, *batch) or (D, K, *batch) rhs with the same
    # batch rank as L, so matrix rhs <=> B.ndim == L.ndim.
    mat_rhs = B.ndim == L.ndim

    def lift(c):  # L entry (*b1) broadcast against rhs rows
        return c[None] if mat_rhs else c

    order = range(D) if not trans else range(D - 1, -1, -1)
    xs = {}
    for i in order:
        s = B[i]
        for j in (range(i) if not trans else range(i + 1, D)):
            c = L[i, j] if not trans else L[j, i]
            s = s - lift(c) * xs[j]
        xs[i] = s / lift(L[i, i])
    return jnp.stack([xs[i] for i in range(D)], axis=0)


def chol_solve(L, B):
    """(L L') X = B."""
    return tri_solve(L, tri_solve(L, B), trans=True)
