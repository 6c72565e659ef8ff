"""Closed-form logpdf gradients via the Fisher/EM identity.

Autodiff through the filter scans stores (or rematerialises) per-step
residuals; the classical alternative computes

    d lml / d theta = E_q[ d log p(x, y; theta) / d theta ]

under the smoothing posterior q — which needs only smoothed marginals and
lag-one cross-covariances, all available in closed form from the parallel
smoother. The result: logpdf+gradient costs ~3 forward-speed passes (filter,
dynamics inversion, smoothing prefix + batched contractions), fully parallel,
with no reverse-mode scan residuals. (Cf. the classical EM sufficient
statistics for LGSSMs, e.g. Sarkka, Bayesian Filtering and Smoothing, ch. 12;
the reference has no analogue — its gradients come from Mooncake AD,
reference: NEWS.md:9-17.)

Scope: forward-ordered, scalar-emission models with SPD per-step Q (the
Matern family and sums of Materns). Deterministic state blocks (Cosine /
Constant / ApproxPeriodic components have Q = 0) make dlml/dQ singular —
use autodiff for those.

NUMERICAL CAVEAT (measured): the dQ/dA terms contract with Q^{-1}, whose
smallest eigenvalue scales like (lam dt)^(2p+1) for a Matern-p/2 model — at
dt << 1/lam the contraction amplifies float64 round-off in the smoothed
sufficient statistics (rel. gradient error ~3e-9 at lam*dt ~ 4, ~3e-7 at ~1,
unusable below ~0.1). Use the default autodiff gradients for densely sampled
series; this path is exact-in-exact-arithmetic and efficient for coarsely
sampled / well-conditioned regimes. A square-root-form rewrite is the known
fix (cf. PAPERS.md, parallel square-root smoothers) — future work.

Exposed as a custom_vjp: the primal runs the block engine; the backward pass
evaluates the closed forms above.
"""

import functools

import jax
import jax.numpy as jnp

from ..utils import psd
from ..utils.fill import Fill, is_fill, tmaterialize
from ..utils.gaussian import Gaussian


def _mT(X):
    return jnp.swapaxes(X, -1, -2)


def _posterior_stats(model, y, engine):
    """Smoothed marginals (incl. the initial state), lag-one cross-covs, and
    what the emission gradients need. All batched over time."""
    from ..models import lgssm as lg

    post = lg.posterior(model, y, engine=engine)
    xs = lg.latent_marginals(post, engine=engine)  # mu_t, Sig_t for t=1..N
    mu, Sig = xs.mean, psd.symmetrize(xs.cov)

    A_rev = tmaterialize(post.trans.As)      # (N, D, D): maps x_t -> x_{t-1}
    a_rev = tmaterialize(post.trans.offs)
    Q_rev = tmaterialize(post.trans.Qs)

    # Cov(x_{t-1}, x_t | y) = A_rev_t Sig_t ; index 0 gives the initial state.
    cross_prev_t = A_rev @ Sig               # (N, D, D)
    mu_prev = jnp.einsum("nij,nj->ni", A_rev, mu) + a_rev       # smoothed x_{t-1}
    Sig_prev = psd.symmetrize(A_rev @ Sig @ _mT(A_rev) + Q_rev)  # Cov(x_{t-1})
    return mu, Sig, mu_prev, Sig_prev, cross_prev_t


def fisher_cotangents(model, y, g, *, engine="parallel"):
    """Cotangents (model_bar, y_bar) of g * logpdf(model, y)."""
    from ..models import emissions as em

    e = model.emis
    assert isinstance(e, em.ScalarEmissions) and model.trans.forward

    dtype = model.trans.x0.dtype
    mu, Sig, mu_prev, Sig_prev, cross_prev = _posterior_stats(model, y, engine)
    N = mu.shape[0]
    D = mu.shape[-1]

    A = tmaterialize(model.trans.As)
    a = tmaterialize(model.trans.offs)
    Q = tmaterialize(model.trans.Qs)
    H = tmaterialize(e.H)
    h = tmaterialize(e.h)
    s = tmaterialize(e.s)
    y = jnp.asarray(y, dtype)

    Qinv = psd.small_inv(psd.symmetrize(Q)) if D <= 3 else jnp.linalg.inv(
        psd.symmetrize(Q)
    )

    # --- transition gradients -------------------------------------------
    # e_t = mu_t - A mu_{t-1} - a
    Amup = jnp.einsum("nij,nj->ni", A, mu_prev)
    e_t = mu - Amup - a
    # E[x_t x_{t-1}'] (centered): C_t = cross_prev' ; E[x_{t-1} x_{t-1}'].
    C_t = _mT(cross_prev)  # Cov(x_t, x_{t-1})
    Exx_prev = Sig_prev + mu_prev[..., :, None] * mu_prev[..., None, :]
    Ex_cross = C_t + mu[..., :, None] * mu_prev[..., None, :]
    dA = Qinv @ (
        Ex_cross - A @ Exx_prev - a[..., :, None] * mu_prev[..., None, :]
    )
    da = jnp.einsum("nij,nj->ni", Qinv, e_t)
    # M_t = E[(x_t - A x_{t-1} - a)(...)'] = Sig_t - C_t A' - A C_t' + A Sig_{t-1} A' + e e'
    M = (
        Sig
        - C_t @ _mT(A)
        - A @ _mT(C_t)
        + A @ Sig_prev @ _mT(A)
        + e_t[..., :, None] * e_t[..., None, :]
    )
    dQ = 0.5 * (Qinv @ (M - psd.symmetrize(Q)) @ Qinv)

    # --- emission gradients ---------------------------------------------
    r = y - (jnp.einsum("ni,ni->n", H, mu) + h)
    HSig = jnp.einsum("ni,nij->nj", H, Sig)
    dH = (r[:, None] * mu - HSig) / s[:, None]
    dh = r / s
    Eres2 = r * r + jnp.einsum("nj,nj->n", HSig, H)
    ds = 0.5 * (Eres2 - s) / (s * s)
    dy = -r / s

    # --- initial state gradients ----------------------------------------
    m0, P0 = model.trans.x0.mean, psd.symmetrize(model.trans.x0.cov)
    mu0, Sig0 = mu_prev[0], Sig_prev[0]
    P0inv = psd.small_inv(P0) if D <= 3 else jnp.linalg.inv(P0)
    d0 = mu0 - m0
    dm0 = P0inv @ d0
    dP0 = 0.5 * (
        P0inv @ (Sig0 + d0[:, None] * d0[None, :] - P0) @ P0inv
    )

    # --- package, honouring Fill structure ------------------------------
    def like(leaf, grads):
        if is_fill(leaf):
            return Fill(g * jnp.sum(grads, axis=0), leaf.N)
        return g * grads

    from ..models.gauss_markov import GaussMarkov
    from ..models.lgssm import LGSSM

    trans_bar = GaussMarkov(
        As=like(model.trans.As, dA),
        offs=like(model.trans.offs, da),
        Qs=like(model.trans.Qs, dQ),
        x0=Gaussian(g * dm0, g * dP0),
        forward=model.trans.forward,
        det_blocks=model.trans.det_blocks,
    )
    emis_bar = em.ScalarEmissions(
        H=like(e.H, dH), h=like(e.h, dh), s=like(e.s, ds)
    )
    return LGSSM(trans_bar, emis_bar), g * dy


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def logpdf_fisher(model, y, n_blocks=None, engine="parallel"):
    """logpdf with closed-form Fisher-identity gradients.

    Forward: block engine. Backward: parallel smoother + batched EM
    sufficient-statistic contractions (no scan residuals).
    """
    from . import block

    return block.logpdf(model, y, n_blocks=n_blocks)


def _fwd(model, y, n_blocks, engine):
    from . import block

    return block.logpdf(model, y, n_blocks=n_blocks), (model, y)


def _bwd(n_blocks, engine, res, g):
    model, y = res
    return fisher_cotangents(model, y, g, engine=engine)


logpdf_fisher.defvjp(_fwd, _bwd)
