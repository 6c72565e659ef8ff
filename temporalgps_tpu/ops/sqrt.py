"""Square-root (QR-form) parallel Kalman filtering elements.

The covariance-form parallel elements (ops/assoc.py) subtract PSD products
inside every combine; in f32 at large state dims the recursion sits near a
conditioning cliff (measured on TPU v5e: the block engine's cross-block
combine NaNs at B=128 for the D=150 spatio-temporal model). This module
re-parameterises the filtering element as

    (A, b, U, eta, Z)   with   C = U U^T,  J = Z Z^T

and performs the combine entirely on the square-root factors, so every
covariance stays PSD *by construction* at any working precision. This is
the square-root parallel-prefix filter in the lineage of Yaghoobi,
Corenflos, Hassan & Sarkka, "Parallel square-root solutions for state
estimation" (see PAPERS.md); the concrete combine below is re-derived
from the covariance-form algebra (assoc.py docstring) via Woodbury.

Derivation. With K = U_i^T Z_j, Lam = I + K K^T, Gam = I + K^T K:

    M  := (I + C_i J_j)^{-1} = I - U_i Lam^{-1} K Z_j^T        (Woodbury)
    M U_i   = U_i Lam^{-1}            =>  A_j M C_i A_j^T = (A_j U_i L_Lam^{-T}) (.)^T
    M^T Z_j = Z_j Gam^{-1}            =>  A_i^T M^T J_j A_i = (A_i^T Z_j L_Gam^{-T}) (.)^T

so the combined roots are single QR re-triangularisations of

    U = tria([A_j U_i L_Lam^{-T},  U_j])
    Z = tria([A_i^T Z_j L_Gam^{-T},  Z_i])

and the A/b/eta updates apply M / M^T through the rank-structured form
above. Both Cholesky targets are I + Gram — unconditionally well-posed —
and `tria` is a QR of a full-row-rank-padded (D, 2D) block, so the combine
has **no conditioning-sensitive subtraction anywhere**.

Cost: ~2 QRs of (D, 2D) + 2 small Choleskys + ~10 (D,D) matmuls per
combine, vs ~8 matmuls + 1 Cholesky congruence for the covariance form —
roughly 2-3x flops, paid only where robustness is needed (`engine="sqrt"`,
or the block engine's cross-block phase via `block.logpdf(...,
phase2="sqrt")`).

Gradient note: reverse-mode AD through QR is undefined at the exactly
rank-deficient roots that arise from zero-padded scalar-emission Z columns;
use the covariance-form engines for differentiation (the drivers do this by
default) — the sqrt engine is the numerically-armoured *forward* path.
"""

import jax
import jax.numpy as jnp

from ..utils import psd
from ..utils.gaussian import Gaussian
from ..models import emissions as em
from . import assoc


# Hard cap on the state dim for the sqrt combine. Measured on v5e: forcing
# block+phase2="sqrt" at D=741 (the reference's Ns=247 bench shape,
# /root/reference/bench/lgssm.jl:75) crashed the TPU WORKER and the compile
# port-relay at Nt=100 (survived Nt=25 at 1.03 s) — the batched (D, 2D) QR
# workspaces blow past what the runtime survives. Big-D models are served
# by engine="sequential"/"kron" (which auto-selects at Ns >= 80); sqrt is a
# moderate-D robustness dial. Raise here rather than let a public-API
# combination take down the device.
SQRT_MAX_D = 192


def check_dim(D):
    if D > SQRT_MAX_D:
        raise ValueError(
            f"square-root combine rejected at latent_dim={D} > "
            f"{SQRT_MAX_D}: batched (D, 2D) QR at this size has crashed "
            "the TPU worker (see ops/sqrt.py SQRT_MAX_D). Use "
            "engine='sequential' (exact) or engine='kron' (factored "
            "spatio-temporal) for big-state models."
        )


def _mT(X):
    return jnp.swapaxes(X, -1, -2)


def tria(X):
    """Compress X (..., D, K) with K >= D to a (..., D, D) lower-triangular
    T with T T^T = X X^T, via QR of X^T."""
    _, r = jnp.linalg.qr(_mT(X), mode="reduced")
    return _mT(r)


def _pad_root(X, D):
    """Make X (..., D, K) into a (..., D, D) root of X X^T: zero-pad columns
    when K < D, QR-compress when K > D."""
    K = X.shape[-1]
    if K == D:
        return X
    if K < D:
        pad = jnp.zeros(X.shape[:-1] + (D - K,), X.dtype)
        return jnp.concatenate([X, pad], axis=-1)
    return tria(X)


def _combine_sqrt(e_i, e_j):
    """Associative combination of square-root filtering elements (batched)."""
    A_i, b_i, U_i, eta_i, Z_i = e_i
    A_j, b_j, U_j, eta_j, Z_j = e_j
    D = A_i.shape[-1]
    I = jnp.eye(D, dtype=A_i.dtype)

    K = _mT(U_i) @ Z_j
    L_lam = psd.cholesky(I + K @ _mT(K))   # chol(I + K K^T): always SPD
    L_gam = psd.cholesky(I + _mT(K) @ K)

    # U = tria([A_j U_i L_lam^{-T}, U_j]);  U_i L_lam^{-T} = (L_lam^{-1} U_i^T)^T
    Ui_Lit = _mT(psd.tri_solve(L_lam, _mT(U_i)))
    U = tria(jnp.concatenate([A_j @ Ui_Lit, U_j], axis=-1))

    # Z = tria([A_i^T Z_j L_gam^{-T}, Z_i])
    ZjAi = _mT(Z_j) @ A_i                  # Z_j^T A_i, reused below
    Zc = _mT(psd.tri_solve(L_gam, ZjAi))
    Z = tria(jnp.concatenate([Zc, Z_i], axis=-1))

    # A = A_j M A_i = A_j A_i - (A_j U_i) Lam^{-1} K (Z_j^T A_i)
    AjUi = A_j @ U_i
    A = A_j @ A_i - AjUi @ psd.chol_solve(L_lam, K @ ZjAi)

    # b = A_j M (b_i + C_i eta_j) + b_j
    v = b_i + jnp.einsum(
        "...ij,...j->...i", U_i, jnp.einsum("...ji,...j->...i", U_i, eta_j)
    )
    Zjv = jnp.einsum("...ji,...j->...i", Z_j, v)
    Mv = v - jnp.einsum(
        "...ij,...j->...i", U_i, psd.chol_solve(L_lam, K @ Zjv[..., None])[..., 0]
    )
    b = jnp.einsum("...ij,...j->...i", A_j, Mv) + b_j

    # eta = A_i^T M^T (eta_j - J_j b_i) + eta_i;  M^T w = w - Z_j K^T Lam^{-1} U_i^T w
    w = eta_j - jnp.einsum(
        "...ij,...j->...i", Z_j, jnp.einsum("...ji,...j->...i", Z_j, b_i)
    )
    Uitw = jnp.einsum("...ji,...j->...i", U_i, w)
    Mtw = w - jnp.einsum(
        "...ij,...j->...i",
        Z_j,
        jnp.einsum("...ji,...jk->...ik", K, psd.chol_solve(L_lam, Uitw[..., None]))[
            ..., 0
        ],
    )
    eta = jnp.einsum("...ji,...j->...i", A_i, Mtw) + eta_i
    return (A, b, U, eta, Z)


# ---------------------------------------------------------------------------
# Element construction (square-root form)
# ---------------------------------------------------------------------------

def _sqrt_elements(F, c, Q, emis_it, y_it, x0: Gaussian):
    """Per-step square-root filtering elements with the prior prepended.

    Same per-step conditioning algebra as assoc._filter_elements, with the
    covariance legs kept in root form: U_C via the Joseph-form root
    tria([(I - K H) U_Q, K U_R]) and Z = F^T H^T L_S^{-T} (zero-padded /
    QR-compressed to (D, D))."""
    D = F.shape[-1]
    dtype = F.dtype
    I = jnp.eye(D, dtype=dtype)
    U_Q = psd.psd_root(Q)  # handles exactly-singular Q (deterministic blocks)

    if isinstance(emis_it, em.ScalarEmissions):
        H, h, s = emis_it.H, emis_it.h, emis_it.s       # (N,D), (N,), (N,)
        u = jnp.einsum("nji,nj->ni", U_Q, H)            # U_Q^T H
        S = jnp.einsum("ni,ni->n", u, u) + s
        K = jnp.einsum("nij,nj->ni", Q, H) / S[:, None]
        ImKH = I - K[:, :, None] * H[:, None, :]
        A_e = ImKH @ F
        resid = y_it - (jnp.einsum("ni,ni->n", H, c) + h)
        b_e = c + K * resid[:, None]
        KUr = (K * jnp.sqrt(s)[:, None])[:, :, None]    # K sqrt(s): (N, D, 1)
        U_e = tria(jnp.concatenate([ImKH @ U_Q, KUr], axis=-1))
        w = jnp.einsum("nji,nj->ni", F, H)              # F^T H
        eta_e = w * (resid / S)[:, None]
        Z_e = _pad_root((w / jnp.sqrt(S)[:, None])[:, :, None], D)
    else:
        H, d, R = assoc._dense_emission_params(emis_it)
        U_R = psd.psd_root(R)
        HUq = H @ U_Q
        S = psd.symmetrize(HUq @ _mT(HUq) + R)
        Ls = psd.cholesky(S)
        K = _mT(psd.chol_solve(Ls, H @ Q))              # (N, D, Dout)
        ImKH = I - K @ H
        A_e = ImKH @ F
        resid = y_it - (jnp.einsum("nij,nj->ni", H, c) + d)
        b_e = c + jnp.einsum("nij,nj->ni", K, resid)
        U_e = tria(jnp.concatenate([ImKH @ U_Q, K @ U_R], axis=-1))
        HtLsinvT = _mT(psd.tri_solve(Ls, H))            # H^T L_S^{-T}: (N, D, Dout)
        Z_e = _pad_root(_mT(F) @ HtLsinvT, D)
        Sinv_resid = psd.chol_solve(Ls, resid[..., None])[..., 0]
        eta_e = jnp.einsum("nji,nj->ni", F, jnp.einsum("nji,nj->ni", H, Sinv_resid))

    prior = (
        jnp.zeros((1, D, D), dtype),
        x0.mean[None].astype(dtype),
        psd.psd_root(x0.cov)[None].astype(dtype),
        jnp.zeros((1, D), dtype),
        jnp.zeros((1, D, D), dtype),
    )
    elems = (A_e, b_e, U_e, eta_e, Z_e)
    return tuple(jnp.concatenate([p, e], axis=0) for p, e in zip(prior, elems))


def to_sqrt_element(e):
    """Convert a covariance-form element tuple (A, b, C, eta, J) to
    square-root form. Used at the block engine's phase-1/phase-2 boundary.
    psd_root (clamped eigh at D > 4) because the prior element carries
    exactly-singular C/J legs."""
    A, b, C, eta, J = e
    return (A, b, psd.psd_root(C), eta, psd.psd_root(J))


def from_sqrt_element(e):
    A, b, U, eta, Z = e
    return (A, b, U @ _mT(U), eta, Z @ _mT(Z))


# ---------------------------------------------------------------------------
# Engine entry points (mirror ops/assoc.py)
# ---------------------------------------------------------------------------

def _filter_prefix(model, y):
    """Inclusive filtering prefixes in iteration order, sqrt recursion.

    Same contract as assoc._filter_prefix: outs has N+1 leading entries with
    outs[0] = x0; covariances are reconstituted as U U^T only at the output
    boundary (the recursion itself never leaves root form)."""
    check_dim(model.latent_dim)
    F_ev, c_ev, Q_ev, F_it, c_it, Q_it, emis_it, y_it = assoc._iteration_view(
        model, y
    )
    elems = _sqrt_elements(F_ev, c_ev, Q_ev, emis_it, y_it, model.trans.x0)
    scanned = jax.lax.associative_scan(_combine_sqrt, elems, axis=0)
    _, b, U, _, _ = scanned
    outs = Gaussian(b, U @ _mT(U))
    return outs, (F_ev, c_ev, Q_ev), (F_it, c_it, Q_it), emis_it, y_it


def filter_(model, y) -> Gaussian:
    outs, _, _, _, _ = _filter_prefix(model, y)
    xf = Gaussian(outs.mean[1:], outs.cov[1:])
    return assoc._unflip(model, xf)


def logpdf(model, y):
    outs, (F_ev, c_ev, Q_ev), _, emis_it, y_it = _filter_prefix(model, y)
    prev = Gaussian(outs.mean[:-1], outs.cov[:-1])
    pre = assoc._batched_predict(prev, F_ev, c_ev, Q_ev)
    _, lmls = em.step_posterior_and_lml(pre, emis_it, y_it)
    return jnp.sum(lmls)


def posterior(model, y):
    """Smoother-as-reverse-LGSSM built from the sqrt filtering prefixes
    (post-processing identical to assoc.posterior)."""
    from ..models.gauss_markov import GaussMarkov
    from ..models.lgssm import LGSSM, _invert_dynamics

    outs, (F_ev, c_ev, Q_ev), (F_it, c_it, Q_it), emis_it, y_it = _filter_prefix(
        model, y
    )
    u = Gaussian(outs.mean[1:], outs.cov[1:])
    prev = Gaussian(outs.mean[:-1], outs.cov[:-1])

    if model.trans.forward:
        xp = assoc._batched_predict(prev, F_ev, c_ev, Q_ev)
        new_dyn = jax.vmap(_invert_dynamics)(prev, xp, F_ev)
        x_last = Gaussian(outs.mean[-1], outs.cov[-1])
    else:
        xp = assoc._batched_predict(u, F_it, c_it, Q_it)
        new_dyn = jax.vmap(_invert_dynamics)(xp, u, F_it)
        x_last = Gaussian(xp.mean[-1], xp.cov[-1])

    As_rev, as_rev, Qs_rev = assoc._unflip(model, new_dyn)
    new_trans = GaussMarkov(
        As=As_rev, offs=as_rev, Qs=Qs_rev, x0=x_last,
        forward=not model.trans.forward,
        det_blocks=model.trans.det_blocks,
    )
    return LGSSM(new_trans, model.emis)
