"""Lane-major small-matrix Kalman kernels.

On TPU, an array of shape (B, D, D) with D in {1,2,3} is catastrophically
tiled: the trailing (D, D) pad to an (8, 128) vector tile, wasting ~99.7% of
every lane. This module stores small matrices/vectors as nested tuples of
(B,)-shaped *components* instead — the batch lives in the lane dimension,
every matrix operation unrolls to a handful of fused (B,) element-wise VPU
ops, and XLA keeps the whole per-step update in registers. This is the
XLA-level equivalent of writing the per-step filter as a hand-fused kernel,
and is the role StaticArrays plays for the reference's per-step math
(reference: src/util/storage_types.jl SArrayStorage path) — translated to a
vector machine.

Components may be scalars (time-invariant Fill parameters broadcast for
free) or (B,) arrays. All functions take the static dimension D from the
tuple structure.
"""

from typing import Tuple

import jax.numpy as jnp

from ..utils.fill import Fill, is_fill

Mat = Tuple[Tuple, ...]
Vec = Tuple


# ---------------------------------------------------------------------------
# (de)composition of array leaves into component tuples
# ---------------------------------------------------------------------------

def decompose_mat(leaf, D):
    """(..., D, D) array or Fill -> D x D tuple of (...,) components."""
    if is_fill(leaf):
        return tuple(
            tuple(Fill(leaf.value[..., i, j], leaf.N) for j in range(D))
            for i in range(D)
        )
    return tuple(tuple(leaf[..., i, j] for j in range(D)) for i in range(D))


def decompose_vec(leaf, D):
    if is_fill(leaf):
        return tuple(Fill(leaf.value[..., i], leaf.N) for i in range(D))
    return tuple(leaf[..., i] for i in range(D))


def mat_to_array(M):
    D = len(M)
    rows = [jnp.stack(jnp.broadcast_arrays(*M[i]), axis=-1) for i in range(D)]
    return jnp.stack(rows, axis=-2)


def vec_to_array(v):
    return jnp.stack(jnp.broadcast_arrays(*v), axis=-1)


# ---------------------------------------------------------------------------
# unrolled matrix algebra on components
# ---------------------------------------------------------------------------

def mm(A: Mat, B: Mat) -> Mat:
    D = len(A)
    K = len(B)
    return tuple(
        tuple(sum(A[i][k] * B[k][j] for k in range(K)) for j in range(len(B[0])))
        for i in range(D)
    )


def mmT(A: Mat, B: Mat) -> Mat:
    """A @ B^T"""
    D = len(A)
    return tuple(
        tuple(sum(A[i][k] * B[j][k] for k in range(len(A[0]))) for j in range(len(B)))
        for i in range(D)
    )


def mTm(A: Mat, B: Mat) -> Mat:
    """A^T @ B"""
    D = len(A[0])
    return tuple(
        tuple(sum(A[k][i] * B[k][j] for k in range(len(A))) for j in range(len(B[0])))
        for i in range(D)
    )


def mv(A: Mat, x: Vec) -> Vec:
    return tuple(sum(A[i][j] * x[j] for j in range(len(x))) for i in range(len(A)))


def mTv(A: Mat, x: Vec) -> Vec:
    return tuple(sum(A[j][i] * x[j] for j in range(len(A))) for i in range(len(A[0])))


def vdot(a: Vec, b: Vec):
    return sum(ai * bi for ai, bi in zip(a, b))


def outer(a: Vec, b: Vec) -> Mat:
    return tuple(tuple(ai * bj for bj in b) for ai in a)


def madd(A: Mat, B: Mat) -> Mat:
    return tuple(
        tuple(A[i][j] + B[i][j] for j in range(len(A[0]))) for i in range(len(A))
    )


def msub(A: Mat, B: Mat) -> Mat:
    return tuple(
        tuple(A[i][j] - B[i][j] for j in range(len(A[0]))) for i in range(len(A))
    )


def mscale(c, A: Mat) -> Mat:
    return tuple(tuple(c * A[i][j] for j in range(len(A[0]))) for i in range(len(A)))


def vadd(a: Vec, b: Vec) -> Vec:
    return tuple(x + y for x, y in zip(a, b))


def vsub(a: Vec, b: Vec) -> Vec:
    return tuple(x - y for x, y in zip(a, b))


def vscale(c, a: Vec) -> Vec:
    return tuple(c * x for x in a)


def sym(A: Mat) -> Mat:
    D = len(A)
    return tuple(
        tuple(0.5 * (A[i][j] + A[j][i]) for j in range(D)) for i in range(D)
    )


def eye(D, ones, zeros):
    return tuple(
        tuple(ones if i == j else zeros for j in range(D)) for i in range(D)
    )


def inv(A: Mat) -> Mat:
    """Adjugate inverse, D <= 3, unrolled to component arithmetic."""
    D = len(A)
    if D == 1:
        return ((1.0 / A[0][0],),)
    if D == 2:
        det = A[0][0] * A[1][1] - A[0][1] * A[1][0]
        r = 1.0 / det
        return (
            (A[1][1] * r, -A[0][1] * r),
            (-A[1][0] * r, A[0][0] * r),
        )
    if D == 3:
        a, b, c = A[0]
        d, e, f = A[1]
        g, h, i = A[2]
        c00 = e * i - f * h
        c01 = f * g - d * i
        c02 = d * h - e * g
        det = a * c00 + b * c01 + c * c02
        r = 1.0 / det
        c10 = c * h - b * i
        c11 = a * i - c * g
        c12 = b * g - a * h
        c20 = b * f - c * e
        c21 = c * d - a * f
        c22 = a * e - b * d
        return (
            (c00 * r, c10 * r, c20 * r),
            (c01 * r, c11 * r, c21 * r),
            (c02 * r, c12 * r, c22 * r),
        )
    raise ValueError(f"lane-major inverse only for D<=3, got {D}")


# ---------------------------------------------------------------------------
# per-step kernels (scalar emissions)
# ---------------------------------------------------------------------------

def step_element(A: Mat, a: Vec, Q: Mat, H: Vec, h, s, y, ones, zeros):
    """Filtering element of one step (lane-major), cf. assoc._filter_elements."""
    D = len(a)
    QH = mv(Q, H)
    S = vdot(H, QH) + s
    K = vscale(1.0 / S, QH)
    ImKH = msub(eye(D, ones, zeros), outer(K, H))
    A_e = mm(ImKH, A)
    resid = y - (vdot(H, a) + h)
    b_e = vadd(a, vscale(resid, K))
    C_e = sym(mm(ImKH, Q))
    w = mTv(A, H)
    eta_e = vscale(resid / S, w)
    J_e = mscale(1.0 / S, outer(w, w))
    return (A_e, b_e, C_e, eta_e, J_e)


def combine(e_i, e_j):
    """Associative filtering-element combination (lane-major),
    cf. assoc._combine_filter."""
    A_i, b_i, C_i, eta_i, J_i = e_i
    A_j, b_j, C_j, eta_j, J_j = e_j
    D = len(b_i)
    CiJj = mm(C_i, J_j)
    M = inv(
        tuple(
            tuple(CiJj[i][j] + (1.0 if i == j else 0.0) for j in range(D))
            for i in range(D)
        )
    )
    AjM = mm(A_j, M)
    MAi = mm(M, A_i)
    A = mm(A_j, MAi)
    b = vadd(mv(AjM, vadd(b_i, mv(C_i, eta_j))), b_j)
    C = sym(madd(mmT(mm(AjM, C_i), A_j), C_j))
    eta = vadd(mTv(MAi, vsub(eta_j, mv(J_j, b_i))), eta_i)
    J = sym(madd(mTm(MAi, mm(J_j, A_i)), J_i))
    return (A, b, C, eta, J)


def kalman_step(m: Vec, P: Mat, A: Mat, a: Vec, Q: Mat, H: Vec, h, s, y):
    """Predict + scalar update + lml (lane-major),
    cf. ops/lgc.posterior_and_lml_scalar."""
    import math

    mp = vadd(mv(A, m), a)
    Pp = madd(sym(mmT(mm(A, P), A)), Q)
    V = mv(Pp, H)  # Pp symmetric: Pp H
    S = vdot(H, V) + s
    resid = y - (vdot(H, mp) + h)
    # math.log (a weak Python float) rather than jnp.log: under x64 the
    # latter materialises an f64 constant whose f64->f32 convert Mosaic
    # cannot legalize inside jvp-linearised kernels.
    lml = -0.5 * (math.log(2 * math.pi) + jnp.log(S) + resid * resid / S)
    K = vscale(1.0 / S, V)
    m_f = vadd(mp, vscale(resid, K))
    P_f = sym(msub(Pp, outer(K, V)))
    return m_f, P_f, lml
