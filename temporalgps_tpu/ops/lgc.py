"""Per-step linear-Gaussian-conditional (LGC) kernels.

TPU-native re-design of the reference's AbstractLGC layer
(reference: src/models/linear_gaussian_conditionals.jl). The reference
dispatches on four struct types (SmallOutputLGC, LargeOutputLGC,
ScalarOutputLGC, BottleneckLGC); here each variant is a set of pure functions
on raw arrays which broadcast over arbitrary leading batch axes, so the same
code path serves

  * one step of a `lax.scan` (no batch axes),
  * a whole time series at once (leading N axis — used by the parallel
    engines), and
  * blocked execution (leading (B,) axes — used by the block-parallel engine).

All conditionals represent  y | x ~ N(A x + a, Q).

Conventions: means are (..., D); covariance matrices (..., D, D); diagonal
covariances (..., D). Scalar-output emissions use H of shape (..., D) and
scalar a, Q, matching the reference's ScalarOutputLGC adjoint-vector A
(reference: linear_gaussian_conditionals.jl:225-257).
"""

import math

import jax.numpy as jnp

from ..config import POSTERIOR_JITTER, RAND_JITTER
from ..utils import psd
from ..utils.gaussian import Gaussian

_LOG2PI = math.log(2.0 * math.pi)


def _mT(X):
    return jnp.swapaxes(X, -1, -2)


# ---------------------------------------------------------------------------
# Transitions / generic dense conditionals ("SmallOutputLGC")
# ---------------------------------------------------------------------------

def predict(x: Gaussian, A, a, Q) -> Gaussian:
    """Push a Gaussian through the conditional: N(Am+a, APA^T+Q)
    (reference: linear_gaussian_conditionals.jl:46-52)."""
    m = jnp.einsum("...ij,...j->...i", A, x.mean) + a
    P = psd.quad_form(A, psd.symmetrize(x.cov)) + Q
    return Gaussian(m, P)


def predict_marginals(x: Gaussian, A, a, Q_diag):
    """Mean and *diagonal* of the predicted covariance — avoids forming the
    full output covariance (reference: linear_gaussian_conditionals.jl:63-68).

    Returns (mean (..., Dout), var (..., Dout)).
    """
    m = jnp.einsum("...ij,...j->...i", A, x.mean) + a
    v = jnp.einsum("...ij,...jk,...ik->...i", A, psd.symmetrize(x.cov), A) + Q_diag
    return m, v


def conditional_rand(eps, x_point, A, a, Q):
    """y = (A x + a) + chol(Q + 1e-9 I) eps
    (reference: linear_gaussian_conditionals.jl:84-87)."""
    L = psd.cholesky(psd.add_jitter(psd.symmetrize(Q), RAND_JITTER))
    return (
        jnp.einsum("...ij,...j->...i", A, x_point)
        + a
        + jnp.einsum("...ij,...j->...i", L, eps)
    )


def posterior_and_lml_small(x: Gaussian, A, a, Q, y):
    """Standard Kalman update via Cholesky of the innovation covariance
    (reference: linear_gaussian_conditionals.jl:129-141).

        V = A P;  S = V A^T + Q;  B = chol(S)^-T? ... we follow the same
        square-root organisation: B = L^{-1} V, alpha = L^{-1} innovation,
        posterior = (m + B^T alpha, P - B^T B).
    """
    m, P = x.mean, psd.symmetrize(x.cov)
    Dout = y.shape[-1]
    V = A @ P  # (..., Dout, D)
    S = psd.symmetrize(V @ _mT(A) + Q)
    L = psd.cholesky(S)
    B = psd.tri_solve(L, V)  # (..., Dout, D)
    innov = y - (jnp.einsum("...ij,...j->...i", A, m) + a)
    alpha = psd.tri_solve(L, innov[..., None])[..., 0]
    lml = -0.5 * (
        Dout * _LOG2PI
        + psd.logdet_from_chol(L)
        + jnp.sum(alpha * alpha, axis=-1)
    )
    m_post = m + jnp.einsum("...ji,...j->...i", B, alpha)
    P_post = P - _mT(B) @ B
    return Gaussian(m_post, P_post), lml


# ---------------------------------------------------------------------------
# ScalarOutputLGC — the single-output time-series emission
# ---------------------------------------------------------------------------

def posterior_and_lml_scalar(x: Gaussian, H, h, s, y):
    """Kalman update for a scalar observation: no Cholesky, just a sqrt
    (reference: linear_gaussian_conditionals.jl:247-257).

    H: (..., D) row of the emission; h, s, y scalars (...,).
    """
    m, P = x.mean, psd.symmetrize(x.cov)
    V = jnp.einsum("...j,...jk->...k", H, P)  # (..., D) = H P
    S = jnp.einsum("...j,...j->...", V, H) + s
    sqrtS = jnp.sqrt(S)
    B = V / sqrtS[..., None]
    alpha = (y - (jnp.einsum("...j,...j->...", H, m) + h)) / sqrtS
    lml = -0.5 * (_LOG2PI + 2.0 * jnp.log(sqrtS) + alpha * alpha)
    m_post = m + B * alpha[..., None]
    P_post = P - B[..., :, None] * B[..., None, :]
    return Gaussian(m_post, P_post), lml


def predict_marginals_scalar(x: Gaussian, H, h, s):
    m = jnp.einsum("...j,...j->...", H, x.mean) + h
    v = jnp.einsum("...i,...ij,...j->...", H, psd.symmetrize(x.cov), H) + s
    return m, v


def conditional_rand_scalar(eps, x_point, H, h, s):
    return jnp.einsum("...j,...j->...", H, x_point) + h + jnp.sqrt(s) * eps


# ---------------------------------------------------------------------------
# LargeOutputLGC — Dout >> Din emissions (spatio-temporal models)
# ---------------------------------------------------------------------------

def posterior_and_lml_large(x: Gaussian, A, a, Q_diag, y):
    """Input-space factorisation for Dout >> Din: all Choleskys are Din x Din
    (reference: linear_gaussian_conditionals.jl:179-204).

        Bt = Q^{-1/2} A chol(P)^T (Dout x Din);
        F  = chol(Bt^T Bt + I)    (Din x Din);
        posterior cov = G^T G with G = F^{-T}? (we keep the same algebra).

    Q is diagonal, passed as (..., Dout).
    """
    m, P_ = x.mean, psd.symmetrize(x.cov)
    dtype = m.dtype
    Dout = y.shape[-1]
    P = psd.add_jitter(P_, POSTERIOR_JITTER)
    Lp = psd.cholesky(P)  # P = Lp Lp^T ; reference uses U = Lp^T
    q_isqrt = 1.0 / jnp.sqrt(Q_diag)  # (..., Dout)
    # Bt = Q^{-1/2} A Lp : (..., Dout, Din)
    Bt = (A * q_isqrt[..., None]) @ Lp
    Din = A.shape[-1]
    F = psd.symmetrize(_mT(Bt) @ Bt) + jnp.eye(Din, dtype=dtype)
    Lf = psd.cholesky(F)
    # G = Lf^{-1} Lp^T (reference: G = F.U' \ P.U)
    G = psd.tri_solve(Lf, _mT(Lp))
    P_post = _mT(G) @ G
    delta = q_isqrt * (y - (jnp.einsum("...ij,...j->...i", A, m) + a))
    beta = psd.tri_solve(Lf, jnp.einsum("...ji,...j->...i", Bt, delta)[..., None])[..., 0]
    m_post = m + jnp.einsum("...ji,...j->...i", G, beta)
    logdet_Q = jnp.sum(jnp.log(Q_diag), axis=-1)
    lml = -0.5 * (
        jnp.sum(delta * delta, axis=-1)
        - jnp.sum(beta * beta, axis=-1)
        + Dout * _LOG2PI
        + psd.logdet_from_chol(Lf)
        + logdet_Q
    )
    return Gaussian(m_post, P_post), lml


# ---------------------------------------------------------------------------
# BottleneckLGC — project to pseudo-point space then fan out
# ---------------------------------------------------------------------------

def project_bottleneck(x: Gaussian, H, h, eps=1e-12) -> Gaussian:
    """z = N(Hm + h, H P H^T + eps I) — the low-dimensional intermediate
    (reference: linear_gaussian_conditionals.jl:308-312)."""
    zm = jnp.einsum("...ij,...j->...i", H, x.mean) + h
    zP = psd.add_jitter(psd.quad_form(H, psd.symmetrize(x.cov)), eps)
    return Gaussian(zm, zP)


def posterior_and_lml_bottleneck(x: Gaussian, H, h, C, c, Q_diag, y):
    """Condition through the bottleneck: update the projected variable with
    the LargeOutput rule, then integrate x | z against z | y
    (reference: linear_gaussian_conditionals.jl:320-335)."""
    z = project_bottleneck(x, H, h)
    z_post, lml = posterior_and_lml_large(z, C, c, Q_diag, y)
    xP = psd.symmetrize(x.cov)
    Lz = psd.cholesky(psd.add_jitter(z.cov, 1e-12))
    HP = H @ xP  # (..., M, D)
    Gt = psd.chol_solve(Lz, HP)  # (..., M, D) = zP^{-1} H P
    m_post = x.mean + jnp.einsum("...ji,...j->...i", Gt, z_post.mean - z.mean)
    P_post = xP + _mT(Gt) @ (z_post.cov - z.cov) @ Gt
    return Gaussian(m_post, P_post), lml


def predict_bottleneck(x: Gaussian, H, h, C, c, Q_diag) -> Gaussian:
    z = project_bottleneck(x, H, h)
    Q = Q_diag[..., None] * jnp.eye(Q_diag.shape[-1], dtype=Q_diag.dtype)
    return predict(z, C, c, Q)


def predict_marginals_bottleneck(x: Gaussian, H, h, C, c, Q_diag):
    z = project_bottleneck(x, H, h)
    return predict_marginals(z, C, c, Q_diag)


def conditional_rand_bottleneck(eps, x_point, H, h, C, c, Q_diag):
    z = jnp.einsum("...ij,...j->...i", H, x_point) + h
    mean = jnp.einsum("...ij,...j->...i", C, z) + c
    return mean + jnp.sqrt(Q_diag + RAND_JITTER) * eps
