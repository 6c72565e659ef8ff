"""Parallel-prefix Kalman filtering/smoothing on `lax.associative_scan`.

The reference's inference loop is strictly sequential
(reference: src/util/scan.jl:15-28). The latent parallelism of Kalman
filtering — associativity of the per-step conditioning operators — is the
basis of this engine, following the 5-tuple element algebra of Sarkka &
Garcia-Fernandez, "Temporal Parallelization of Bayesian Smoothers" (2021)
(see PAPERS.md lineage). Depth is O(log N) instead of O(N); every combine
level is one batch of small dense matmuls that XLA maps onto the MXU/VPU.

Element algebra (covariance form). A filtering element represents the map
p(x_k | x_{j}, y_{j+1:k}) as (A, b, C, eta, J):

    x_k | x_j ~ N(A x_j + b, C)   reweighted by   exp(eta' x_j - x_j' J x_j / 2)

Composition (i earlier, j later), with M = (I + C_i J_j)^{-1}:

    A = A_j M A_i
    b = A_j M (b_i + C_i eta_j) + b_j
    C = A_j M C_i A_j' + C_j
    eta = A_i' M' (eta_j - J_j b_i) + eta_i
    J = A_i' M' J_j A_i + J_i

The prior enters as the element (0, m0, P0, 0, 0), so the inclusive prefix at
position k is exactly the filtering distribution — no special-cased first
element. The asymmetric inverse M is computed with a closed-form adjugate for
D <= 3 (pure VPU code, f64-safe on TPU) and a Cholesky congruence
(I + C J)^{-1} = Lc (I + Lc' J Lc)^{-1} Lc^{-1} for larger D (TPU f64-safe:
no LU custom call).
"""

import jax
import jax.numpy as jnp

from ..utils import psd
from ..utils.fill import tmaterialize
from ..utils.gaussian import Gaussian
from ..models import emissions as em


def _mT(X):
    return jnp.swapaxes(X, -1, -2)


def _minv(C, J):
    """(I + C J)^{-1}, batched; C, J symmetric PSD."""
    D = C.shape[-1]
    I = jnp.eye(D, dtype=C.dtype)
    M = I + C @ J
    if D <= 3:
        return psd.small_inv(M)
    # Cholesky congruence: C = Lc Lc' (jittered); then
    # (I + C J)^{-1} = Lc (I + Lc' J Lc)^{-1} Lc^{-1}, SPD inner solve.
    # Jitter scaled to dtype round-off AND to the magnitude of C: a fixed
    # 1e-10 is below f32 noise for big-D spatio-temporal covariances
    # (Kr (x) P_inf grams), whose symmetrized round-off is ~sqrt(D)*eps*|C|.
    Cs = psd.symmetrize(C)
    eps = psd.dtype_jitter(C.dtype, f64_eps=1e-10, f32_eps=3e-6)
    if jnp.finfo(Cs.dtype).bits <= 32:
        # f32 only: scale to the covariance magnitude (round-off grows with
        # |C|). f64 keeps the reference-exact absolute 1e-10 — scaling it
        # measurably perturbs conditioning-sensitive consumers (the Fisher
        # gradient identity) for no stability benefit.
        eps = eps * jnp.maximum(
            jnp.max(jnp.abs(jnp.diagonal(Cs, axis1=-2, axis2=-1)), axis=-1),
            jnp.asarray(1.0, Cs.dtype),
        )[..., None, None]
    Lc = psd.cholesky(Cs + eps * I)
    S = psd.symmetrize(_mT(Lc) @ J @ Lc) + I
    Ls = psd.cholesky(S)
    Lc_inv = psd.tri_solve(Lc, jnp.broadcast_to(I, Lc.shape))
    return Lc @ psd.chol_solve(Ls, Lc_inv)


def _combine_filter(e_i, e_j):
    """Associative combination of filtering elements (batched)."""
    A_i, b_i, C_i, eta_i, J_i = e_i
    A_j, b_j, C_j, eta_j, J_j = e_j
    M = _minv(C_i, J_j)
    AjM = A_j @ M
    MAi = M @ A_i
    A = A_j @ MAi
    b = jnp.einsum("...ij,...j->...i", AjM, b_i + jnp.einsum("...ij,...j->...i", C_i, eta_j)) + b_j
    C = psd.symmetrize(AjM @ C_i @ _mT(A_j) + C_j)
    # A_i' (I + J_j C_i)^{-1} = A_i' M' = (M A_i)'  since (I+JC) = (I+CJ)'.
    eta = jnp.einsum(
        "...ji,...j->...i", MAi, eta_j - jnp.einsum("...ij,...j->...i", J_j, b_i)
    ) + eta_i
    J = psd.symmetrize(_mT(MAi) @ J_j @ A_i + J_i)
    return (A, b, C, eta, J)


def _combine_affine(e_i, e_j):
    """Associative composition of affine-Gaussian maps (A, b, C):
    x -> N(A x + b, C). Used for marginals; C omitted for sampling."""
    A_i, b_i, C_i = e_i
    A_j, b_j, C_j = e_j
    A = A_j @ A_i
    b = jnp.einsum("...ij,...j->...i", A_j, b_i) + b_j
    C = psd.symmetrize(A_j @ C_i @ _mT(A_j) + C_j)
    return (A, b, C)


def _combine_affine_mean(e_i, e_j):
    A_i, b_i = e_i
    A_j, b_j = e_j
    return (A_j @ A_i, jnp.einsum("...ij,...j->...i", A_j, b_i) + b_j)


# ---------------------------------------------------------------------------
# Iteration-order views of an LGSSM
# ---------------------------------------------------------------------------

def _flip(tree):
    return jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=0), tree)


def _iteration_view(model, y=None):
    """Materialised parameters in *iteration* order with the transition
    re-alignment that turns both orderings into the same element form.

    Forward models interleave transition-then-update; Reverse models
    update-then-transition. Shifting the reverse transitions by one (identity
    first) re-expresses a reverse model in transition-then-update form, so a
    single element algebra serves both orderings.

    Returns (F_ev, c_ev, Q_ev, F_it, c_it, Q_it, emis_it, y_it) where *_ev are
    the element-view (shifted for reverse) transitions and *_it the plain
    iteration-order ones.
    """
    t = model.trans
    F = tmaterialize(t.As)
    c = tmaterialize(t.offs)
    Q = tmaterialize(t.Qs)
    emis = tmaterialize(model.emis)
    if t.forward:
        return F, c, Q, F, c, Q, emis, y
    F_it, c_it, Q_it = jnp.flip(F, 0), jnp.flip(c, 0), jnp.flip(Q, 0)
    emis_it = _flip(emis)
    y_it = None if y is None else jnp.flip(jnp.asarray(y), 0)
    D = F.shape[-1]
    I = jnp.eye(D, dtype=F.dtype)
    F_ev = jnp.concatenate([I[None], F_it[:-1]], axis=0)
    c_ev = jnp.concatenate([jnp.zeros((1, D), c.dtype), c_it[:-1]], axis=0)
    Q_ev = jnp.concatenate([jnp.zeros((1, D, D), Q.dtype), Q_it[:-1]], axis=0)
    return F_ev, c_ev, Q_ev, F_it, c_it, Q_it, emis_it, y_it


def _unflip(model, arr_tree):
    if model.trans.forward:
        return arr_tree
    return _flip(arr_tree)


# ---------------------------------------------------------------------------
# Element construction
# ---------------------------------------------------------------------------

def _filter_elements(F, c, Q, emis_it, y_it, x0: Gaussian):
    """Per-step filtering elements, with the prior element prepended."""
    D = F.shape[-1]
    N = F.shape[0]
    dtype = F.dtype
    I = jnp.eye(D, dtype=dtype)

    if isinstance(emis_it, em.ScalarEmissions):
        H, h, s = emis_it.H, emis_it.h, emis_it.s  # (N,D), (N,), (N,)
        S = jnp.einsum("ni,nij,nj->n", H, Q, H) + s
        K = jnp.einsum("nij,nj->ni", Q, H) / S[:, None]  # (N, D)
        ImKH = I - K[:, :, None] * H[:, None, :]
        A_e = ImKH @ F
        resid = y_it - (jnp.einsum("ni,ni->n", H, c) + h)
        b_e = c + K * resid[:, None]
        C_e = psd.symmetrize(ImKH @ Q)
        w = jnp.einsum("nji,nj->ni", F, H)  # F' H
        eta_e = w * (resid / S)[:, None]
        J_e = psd.symmetrize(w[:, :, None] * w[:, None, :] / S[:, None, None])
    elif (diag := _diag_emission_params(emis_it)) is not None:
        Hd, dd, s_diag = diag
        A_e, b_e, C_e, eta_e, J_e = element_dense_diag(
            F, c, Q, Hd, dd, s_diag, y_it
        )
    else:
        H, d, R = _dense_emission_params(emis_it)
        S = psd.symmetrize(H @ Q @ _mT(H) + R)
        Ls = psd.cholesky(S)
        K = _mT(psd.chol_solve(Ls, H @ Q))  # (N, D, Dout)
        ImKH = I - K @ H
        A_e = ImKH @ F
        resid = y_it - (jnp.einsum("nij,nj->ni", H, c) + d)
        b_e = c + jnp.einsum("nij,nj->ni", K, resid)
        C_e = psd.symmetrize(ImKH @ Q)
        HtSinv = _mT(psd.chol_solve(Ls, H))  # (N, D, Dout) = H' S^{-1}
        FtH = _mT(F) @ HtSinv  # (N, D, Dout)
        eta_e = jnp.einsum("nij,nj->ni", FtH, resid)
        J_e = psd.symmetrize(FtH @ H @ F)

    prior = (
        jnp.zeros((1, D, D), dtype),
        x0.mean[None].astype(dtype),
        psd.symmetrize(x0.cov)[None].astype(dtype),
        jnp.zeros((1, D), dtype),
        jnp.zeros((1, D, D), dtype),
    )
    elems = (A_e, b_e, C_e, eta_e, J_e)
    return tuple(
        jnp.concatenate([p, e], axis=0) for p, e in zip(prior, elems)
    )


def element_dense_diag(F, c, Q, H, d, s_diag, y):
    """Filtering element for vector emissions with DIAGONAL observation
    noise, via the input-space (LargeOutputLGC-style) factorisation: every
    Cholesky/solve is Din-dim; the only Dout-sized work is one
    (Dout,Din)x(Dout,Din) gram and two matvecs — MXU-shaped batched matmuls
    instead of a per-step Dout-dim innovation Cholesky (reference analogue:
    linear_gaussian_conditionals.jl:179-204, applied here to the parallel
    element construction, which the reference does not have).

    With B = H Lp (Lp = chol(Q)) and R = diag(s):
        S   = B B' + R
        Fm  = I + B' R^{-1} B = I + Lp' Gram Lp,   Gram = H' R^{-1} H
        P_e = Lp Fm^{-1} Lp'           (PSD by construction)
        K r = Lp Fm^{-1} Lp' u,        u = H' R^{-1} r
        H' S^{-1} H = Gram - T' Fm^{-1} T,   T = Lp' Gram
        H' S^{-1} r = u - T' Fm^{-1} (Lp' u)
    Batched over arbitrary leading axes.
    """
    from ..config import IDENT_EPS

    D = F.shape[-1]
    dtype = F.dtype
    I = jnp.eye(D, dtype=dtype)
    q_isqrt = 1.0 / jnp.sqrt(s_diag)                       # (..., Dout)
    Hw = H * q_isqrt[..., None]                            # (..., Dout, D)
    delta = q_isqrt * (y - (jnp.einsum("...ij,...j->...i", H, c) + d))
    Gram = psd.symmetrize(_mT(Hw) @ Hw)                    # (..., D, D)
    u = jnp.einsum("...ji,...j->...i", Hw, delta)          # H' R^{-1} r
    Lp = psd.cholesky(psd.add_jitter(psd.symmetrize(Q), IDENT_EPS))
    T = _mT(Lp) @ Gram                                     # (..., D, D)
    Fm = psd.symmetrize(T @ Lp) + I
    Lf = psd.cholesky(Fm)
    G = psd.tri_solve(Lf, _mT(Lp))                         # Lf^{-1} Lp'
    C_e = _mT(G) @ G                                       # Lp Fm^{-1} Lp'
    Lpu = jnp.einsum("...ji,...j->...i", Lp, u)            # Lp' u
    FmiLpu = psd.chol_solve(Lf, Lpu[..., None])[..., 0]    # Fm^{-1} Lp' u
    b_e = c + jnp.einsum("...ij,...j->...i", Lp, FmiLpu)   # c + K r
    M1 = psd.symmetrize(Gram - _mT(T) @ psd.chol_solve(Lf, T))  # H'S^{-1}H
    A_e = F - psd.symmetrize(Q) @ (M1 @ F)                 # (I - K H) F
    w = u - jnp.einsum("...ji,...j->...i", T, FmiLpu)      # H' S^{-1} r
    eta_e = jnp.einsum("...ji,...j->...i", F, w)
    J_e = psd.symmetrize(_mT(F) @ M1 @ F)
    return (A_e, b_e, C_e, eta_e, J_e)


def _diag_emission_params(e):
    """(H, d, s_diag) for the diagonal-noise vector emissions (Large /
    Bottleneck), batched over leading axes; None if not applicable."""
    if isinstance(e, em.LargeEmissions):
        return e.C, e.c, e.s_diag
    if isinstance(e, em.BottleneckEmissions):
        H = e.C @ e.H
        d = jnp.einsum("...ij,...j->...i", e.C, e.h) + e.c
        return H, d, e.s_diag
    return None


def _dense_emission_params(emis_it):
    """(H, d, R) dense per-step for vector-output emissions."""
    if isinstance(emis_it, em.DenseEmissions):
        return emis_it.H, emis_it.h, emis_it.S
    if isinstance(emis_it, em.LargeEmissions):
        R = emis_it.s_diag[..., None] * jnp.eye(
            emis_it.s_diag.shape[-1], dtype=emis_it.s_diag.dtype
        )
        return emis_it.C, emis_it.c, R
    if isinstance(emis_it, em.BottleneckEmissions):
        # Effective A = C H, a = C h + c (exact composition).
        A = emis_it.C @ emis_it.H
        d = jnp.einsum("nij,nj->ni", emis_it.C, emis_it.h) + emis_it.c
        R = emis_it.s_diag[..., None] * jnp.eye(
            emis_it.s_diag.shape[-1], dtype=emis_it.s_diag.dtype
        )
        return A, d, R
    raise TypeError(type(emis_it))


def _filter_prefix(model, y):
    """Inclusive filtering prefixes in iteration order.

    Returns (outs, ev, it, emis_it, y_it) where outs is a Gaussian with N+1
    leading entries: outs[0] = x0, outs[k] = filtering distribution after the
    k-th update.
    """
    F_ev, c_ev, Q_ev, F_it, c_it, Q_it, emis_it, y_it = _iteration_view(model, y)
    elems = _filter_elements(F_ev, c_ev, Q_ev, emis_it, y_it, model.trans.x0)
    scanned = jax.lax.associative_scan(_combine_filter, elems, axis=0)
    _, b, C, _, _ = scanned
    outs = Gaussian(b, C)
    return outs, (F_ev, c_ev, Q_ev), (F_it, c_it, Q_it), emis_it, y_it


def _batched_predict(x: Gaussian, F, c, Q) -> Gaussian:
    m = jnp.einsum("nij,nj->ni", F, x.mean) + c
    P = psd.symmetrize(F @ psd.symmetrize(x.cov) @ _mT(F) + Q)
    return Gaussian(m, P)


# ---------------------------------------------------------------------------
# Public engine entry points (same semantics as models.lgssm sequential)
# ---------------------------------------------------------------------------

def filter_(model, y) -> Gaussian:
    outs, _, _, _, _ = _filter_prefix(model, y)
    xf = Gaussian(outs.mean[1:], outs.cov[1:])
    return _unflip(model, xf)


def logpdf(model, y):
    outs, (F_ev, c_ev, Q_ev), _, emis_it, y_it = _filter_prefix(model, y)
    prev = Gaussian(outs.mean[:-1], outs.cov[:-1])
    pre = _batched_predict(prev, F_ev, c_ev, Q_ev)
    _, lmls = em.step_posterior_and_lml(pre, emis_it, y_it)
    return jnp.sum(lmls)


def latent_marginals(model, *, engine="parallel") -> Gaussian:
    """Marginals of the latent chain via affine-composition prefix scan."""
    F_ev, c_ev, Q_ev, F_it, c_it, Q_it, emis_it, _ = _iteration_view(model)
    x0 = model.trans.x0
    D = F_ev.shape[-1]
    dtype = F_ev.dtype
    prior = (
        jnp.zeros((1, D, D), dtype),
        x0.mean[None].astype(dtype),
        psd.symmetrize(x0.cov)[None].astype(dtype),
    )
    elems = tuple(
        jnp.concatenate([p, e], axis=0)
        for p, e in zip(prior, (F_ev, c_ev, Q_ev))
    )
    A, b, C = jax.lax.associative_scan(_combine_affine, elems, axis=0)
    # The identity-prepended element view already encodes the
    # emit-before-transition semantics of Reverse ordering (reference:
    # lgssm.jl:111-114), so prefixes 1..N are correct for both orderings.
    xs = Gaussian(b[1:], C[1:])
    return _unflip(model, xs)


def rand_with_eps(model, eps_t, eps_e, x_init, *, engine="parallel"):
    """Joint sample via affine-mean prefix composition."""
    F_ev, c_ev, Q_ev, F_it, c_it, Q_it, emis_it, _ = _iteration_view(model)
    if not model.trans.forward:
        eps_t = jnp.flip(eps_t, 0)
        eps_e = jnp.flip(eps_e, 0)
        # align noise with the shifted element-view transitions
        eps_t = jnp.concatenate([jnp.zeros_like(eps_t[:1]), eps_t[:-1]], axis=0)
    Lq = psd.cholesky(psd.add_jitter(psd.symmetrize(Q_ev), 1e-9))
    b = c_ev + jnp.einsum("nij,nj->ni", Lq, eps_t)
    D = F_ev.shape[-1]
    dtype = F_ev.dtype
    prior = (jnp.zeros((1, D, D), dtype), x_init[None].astype(dtype))
    elems = tuple(
        jnp.concatenate([p, e], axis=0) for p, e in zip(prior, (F_ev, b))
    )
    _, states = jax.lax.associative_scan(_combine_affine_mean, elems, axis=0)
    xs = states[1:]  # identity-prepend handles both orderings, as above
    ys = em.step_conditional_rand(eps_e, xs, emis_it)
    return _unflip(model, ys)


def posterior(model, y, *, engine="parallel"):
    """Parallel construction of the smoother-as-reverse-LGSSM: prefix filter
    + batched dynamics inversion (reference semantics: lgssm.jl:193-240)."""
    from ..models.gauss_markov import GaussMarkov
    from ..models.lgssm import LGSSM, _invert_dynamics

    outs, (F_ev, c_ev, Q_ev), (F_it, c_it, Q_it), emis_it, y_it = _filter_prefix(
        model, y
    )
    u = Gaussian(outs.mean[1:], outs.cov[1:])       # post-update, iteration order
    prev = Gaussian(outs.mean[:-1], outs.cov[:-1])  # pre-element states

    if model.trans.forward:
        xp = _batched_predict(prev, F_ev, c_ev, Q_ev)
        new_dyn = jax.vmap(_invert_dynamics)(prev, xp, F_ev)
        x_last = Gaussian(outs.mean[-1], outs.cov[-1])
    else:
        xp = _batched_predict(u, F_it, c_it, Q_it)
        new_dyn = jax.vmap(_invert_dynamics)(xp, u, F_it)
        x_last = Gaussian(xp.mean[-1], xp.cov[-1])

    As_rev, as_rev, Qs_rev = _unflip(model, new_dyn)
    new_trans = GaussMarkov(
        As=As_rev, offs=as_rev, Qs=Qs_rev, x0=x_last,
        forward=not model.trans.forward,
        det_blocks=model.trans.det_blocks,
    )
    return LGSSM(new_trans, model.emis)
