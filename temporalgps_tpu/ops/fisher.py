"""Closed-form logpdf gradients via the Fisher/EM identity, innovations form.

Autodiff through the filter scans stores (or rematerialises) per-step
residuals; the classical alternative computes

    d lml / d theta = E_q[ d log p(x, y; theta) / d theta ]

under the smoothing posterior q — which needs only smoothed marginals plus
filter predictions, all available in closed form from the parallel
filter/smoother. The result: logpdf+gradient costs ~3-4 forward-speed passes
(filter, dynamics inversion, smoothing prefix + batched contractions), fully
parallel, no reverse-mode scan residuals, and cost INDEPENDENT of the
hyperparameter count. (Cf. the classical EM sufficient statistics for
LGSSMs, e.g. Sarkka, Bayesian Filtering and Smoothing, ch. 12; the reference
has no analogue — its gradients come from Mooncake AD, reference:
NEWS.md:9-17.)

INNOVATIONS FORM (the round-3 conditioning fix). The textbook statistics
contract with Q^{-1}, whose smallest eigenvalue scales like (lam dt)^(2p+1)
for a Matern-p/2 model: at lam*dt << 1 they amplify f64 round-off in the
smoothed moments catastrophically (the round-2 implementation was unusable
below lam*dt ~ 0.1). But the Q^{-1} factors cancel ANALYTICALLY against the
smallness of the posterior noise statistics. With J the RTS gain (== the
reverse-LGSSM transition), G = Q P_pred^{-1}, and the identities
A J = I - G, G P_pred = Q:

    E[w_t]          = G (mu_t - m_pred_t)
    Cov[w_t] - Q    = G (Sig_t - P_pred_t) G'
    Cov[w_t, x_t-1] = G (Sig_t - P_pred_t) J'

so Q^{-1} G = P_pred^{-1} collapses every gradient to contractions with the
WELL-CONDITIONED predicted covariance:

    dA_t = P_pred^{-1} [ (Sig_t - P_pred) J' + (mu_t - m_pred) mu^s_t-1' ]
    da_t = P_pred^{-1} (mu_t - m_pred)
    dQ_t = 1/2 P_pred^{-1} [ (Sig_t - P_pred)
                             + (mu_t - m_pred)(mu_t - m_pred)' ] P_pred^{-1}

No Q^{-1} appears anywhere; accuracy is flat in lam*dt (tested down to
lam*dt = 1e-3, f32 and f64).

Scope: forward-ordered, scalar-emission models. SEMI-DEFINITE Q is fine:
the innovations form above is exactly Koopman's exact score in
disturbance-smoother variables (mu_t - m_pred_t = P_pred r_{t-1},
Sig_t - P_pred_t = -P_pred N_{t-1} P_pred; Durbin & Koopman sec. 4.4 /
Koopman & Shephard 1992), derived from the filter adjoint rather than the
EM complete-data density — so deterministic state blocks (Cosine /
Constant / ApproxPeriodic, Q = 0) are supported. Measured (f64, the
D=19 Matern+ApproxPeriodic sum, probes/fisher_detblock_probe.py): grad rel
error vs autodiff 7e-6 / 1.2e-6 / 2.5e-5 at N = 256 / 1024 / 4096. The
basis engine (ops/basis.py) remains the preferred path for such kernels —
it removes the deterministic blocks from the filter entirely.

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
    """Smoothed marginals, the RTS gains (the reverse-LGSSM transitions),
    filter predictions, and the initial-state smoothed moments. All batched
    over time."""
    from ..models import lgssm as lg

    post = lg.posterior(model, y, engine=engine)
    xs = lg.latent_marginals(post, engine=engine)  # mu_t, Sig_t for t=1..N
    mu, Sig = xs.mean, psd.symmetrize(xs.cov)

    J = tmaterialize(post.trans.As)          # (N, D, D): the RTS gain J_{t-1}
    a_rev = tmaterialize(post.trans.offs)
    Q_rev = tmaterialize(post.trans.Qs)

    mu_prev = jnp.einsum("nij,nj->ni", J, mu) + a_rev  # smoothed x_{t-1}
    # initial-state smoothed moments (index 0 of the reverse model)
    Sig_prev0 = psd.symmetrize(J[0] @ Sig[0] @ J[0].T + Q_rev[0])

    # filter predictions: m_pred_t = A m_f_{t-1} + a, P_pred = A P_f A' + Q
    filt = lg.filter_(model, y, engine=engine)
    A = tmaterialize(model.trans.As)
    a = tmaterialize(model.trans.offs)
    Q = tmaterialize(model.trans.Qs)
    x0 = model.trans.x0
    m_fp = jnp.concatenate([x0.mean[None], filt.mean[:-1]], axis=0)
    P_fp = jnp.concatenate(
        [psd.symmetrize(x0.cov)[None], psd.symmetrize(filt.cov[:-1])], axis=0
    )
    m_pred = jnp.einsum("nij,nj->ni", A, m_fp) + a
    P_pred = psd.symmetrize(A @ P_fp @ _mT(A) + Q)
    return mu, Sig, mu_prev, Sig_prev0, J, m_pred, P_pred


def fisher_cotangents(model, y, g, *, engine="parallel"):
    """Cotangents (model_bar, y_bar) of g * logpdf(model, y)."""
    from ..models import emissions as em

    e = model.emis
    assert isinstance(e, em.ScalarEmissions) and model.trans.forward

    dtype = model.trans.x0.dtype
    (mu, Sig, mu_prev, Sig_prev0, J, m_pred, P_pred) = _posterior_stats(
        model, y, engine
    )
    D = mu.shape[-1]

    H = tmaterialize(e.H)
    h = tmaterialize(e.h)
    s = tmaterialize(e.s)
    y = jnp.asarray(y, dtype)

    # --- transition gradients (innovations form — see module docstring) --
    Lp = psd.cholesky(P_pred)
    d = mu - m_pred                        # (N, D)
    X = Sig - P_pred                       # (N, D, D)
    da = psd.chol_solve(Lp, d[..., :, None])[..., 0]
    dA = psd.chol_solve(
        Lp, X @ _mT(J) + d[..., :, None] * mu_prev[..., None, :]
    )
    S_q = X + d[..., :, None] * d[..., None, :]
    dQ = 0.5 * _mT(psd.chol_solve(Lp, _mT(psd.chol_solve(Lp, S_q))))

    # --- emission gradients ---------------------------------------------
    r = y - (jnp.einsum("ni,ni->n", H, mu) + h)
    HSig = jnp.einsum("ni,nij->nj", H, Sig)
    dH = (r[:, None] * mu - HSig) / s[:, None]
    dh = r / s
    Eres2 = r * r + jnp.einsum("nj,nj->n", HSig, H)
    ds = 0.5 * (Eres2 - s) / (s * s)
    dy = -r / s

    # --- initial state gradients ----------------------------------------
    # same innovations structure with the "prediction" being the prior x0:
    # dm0 = P0^{-1} d0, dP0 = 1/2 P0^{-1} [(Sig0 - P0) + d0 d0'] P0^{-1}
    m0, P0 = model.trans.x0.mean, psd.symmetrize(model.trans.x0.cov)
    mu0, Sig0 = mu_prev[0], Sig_prev0
    L0 = psd.cholesky(P0)
    d0 = mu0 - m0
    dm0 = psd.chol_solve(L0, d0[:, None])[:, 0]
    S0 = (Sig0 - P0) + d0[:, None] * d0[None, :]
    dP0 = 0.5 * psd.chol_solve(L0, psd.chol_solve(L0, S0).T)

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


def logpdf_fisher(model, y, n_blocks=None, engine="parallel"):
    """logpdf with closed-form Fisher-identity gradients.

    Forward: block engine. Backward: parallel smoother + batched EM
    sufficient-statistic contractions (no scan residuals). The ambient
    matmul precision is captured here and re-applied inside the bwd —
    custom_vjp bwd traces outside the caller's precision scope
    (config.ambient_matmul_precision).
    """
    from ..config import ambient_matmul_precision

    return _logpdf_fisher_cv(model, y, n_blocks, engine,
                             ambient_matmul_precision())


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _logpdf_fisher_cv(model, y, n_blocks, engine, prec):
    from . import block

    return block.logpdf(model, y, n_blocks=n_blocks)


def _fwd(model, y, n_blocks, engine, prec):
    from . import block

    return block.logpdf(model, y, n_blocks=n_blocks), (model, y)


def _bwd(n_blocks, engine, prec, res, g):
    from ..config import matmul_precision_ctx

    model, y = res
    # ambient None = the TPU bf16 default — never right for a reverse
    # pass; floor at 'highest' (see ops/block._logpdf_pallas_bwd).
    with matmul_precision_ctx(prec or "highest"):
        return fisher_cotangents(model, y, g, engine=engine)


_logpdf_fisher_cv.defvjp(_fwd, _bwd)
