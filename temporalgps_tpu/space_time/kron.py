"""Kronecker-structured exact spatio-temporal filter.

The exact grid compiler (to_gauss_markov.py, mirroring reference
src/space_time/to_gauss_markov.jl:1-24) materialises

    A = I_Ns (x) A_t,   Q = Kr (x) Q_t,   H = I_Ns (x) h_t^T

and runs the generic dense Kalman recursion in the D = Ns*Dt state — O(D^3)
= O(Ns^3 Dt^3) per step. This engine keeps the factors and reshapes the
state as m (Ns, Dt), P (Ns, Dt, Ns, Dt), so that

    predict:  m' = m A_t^T + a_t                    O(Ns Dt^2)
              P' = (A_t . P . A_t^T) + Kr (x) Q_t   O(Ns^2 Dt^3)
    update:   S  = h^T P' h + diag(s)  (Ns x Ns)    O(Ns^2 Dt^2)
              Cholesky of S, gain, downdate         O(Ns^3 + Ns^2 Dt)

— a ~Ns/2-fold flop reduction of the dominant predict step over the
materialised form (the reference has no analogue: it always materialises,
src/space_time/to_gauss_markov.jl:14-18). The per-step Ns x Ns innovation
Cholesky is shared with the dense path and is the irreducible cost.

Scope: pure `Separable` kernels on a `RectilinearGrid` (the plain-exact
model family). Sum/Scaled compositions and DTC models keep the generic
engines. Missing data (NaN in y) is supported through the standard
large-variance fill (models/missings.py) applied to the per-step noise
diagonal.
"""

import math

import jax
import jax.numpy as jnp

from ..config import precision_ctx
from ..gp import kernels as K
from ..gp.lti_sde import lgssm_components as temporal_lgssm_components
from ..gp.means import ConstMean, ZeroMean
from ..models.missings import fill_in_missings, _volume_compensation
from ..utils import psd
from ..utils.fill import scan_emit
from . import grids
from .separable import Separable


def _unwrap_scaled(kernel):
    """Peel Scaled wrappers (sigma^2 * k scales the emission row by sigma,
    reference: src/gp/lti_sde.jl:324-346); returns (sigma2, core kernel)."""
    sigma2 = 1.0
    while isinstance(kernel, K.Scaled):
        sigma2 = sigma2 * kernel.sigma2
        kernel = kernel.kernel
    return sigma2, kernel


def supports(fx) -> bool:
    """True when fx is a (possibly Scaled) Separable model on a
    RectilinearGrid."""
    return (
        isinstance(getattr(fx, "x", None), grids.RectilinearGrid)
        and isinstance(_unwrap_scaled(fx.f.f.kernel)[1], Separable)
        and isinstance(fx.f.f.mean, (ZeroMean, ConstMean))
    )


def _factors(fx):
    """(temporal per-step components, Kr, x0 factors, noise_tf, dtype)."""
    from ..gp.lti_sde import _storage_dtype

    f = fx.f
    dtype = _storage_dtype(f.storage)
    sigma2, kernel = _unwrap_scaled(f.f.kernel)
    if not isinstance(kernel, Separable):
        raise TypeError(
            "kron engine requires a (possibly Scaled) Separable kernel"
        )
    x = fx.x
    ts = grids.get_times(x)
    As_t, offs_t, Qs_t, (Hs_t, hs_t), x0_t = temporal_lgssm_components(
        kernel.r, ts, dtype
    )
    if not isinstance(sigma2, float) or sigma2 != 1.0:
        from ..gp.lti_sde import _combine_leaves

        sigma = jnp.sqrt(jnp.asarray(sigma2, dtype))
        Nt_ = grids.n_time(x)
        Hs_t = _combine_leaves(lambda H: sigma * H, [Hs_t], Nt_)
        hs_t = _combine_leaves(lambda h: sigma * h, [hs_t], Nt_)
    # same dtype-aware spatial-gram jitter as the materialising compiler
    Kr_raw = K.gram(kernel.l, x.xl)
    eps = psd.dtype_jitter(dtype) * jnp.mean(jnp.diagonal(Kr_raw))
    Kr = (Kr_raw + eps * jnp.eye(Kr_raw.shape[0], dtype=Kr_raw.dtype)).astype(dtype)

    mean_fn = f.f.mean
    if isinstance(mean_fn, ConstMean):
        from ..gp.lti_sde import _combine_leaves

        c = jnp.asarray(mean_fn.c, dtype)
        hs_t = _combine_leaves(lambda h: h + c, [hs_t], grids.n_time(x))

    noise_flat = fx.noise
    from ..utils.fill import is_fill

    if is_fill(noise_flat):
        noise_flat = jnp.broadcast_to(noise_flat.value, (noise_flat.N,))
    noise_tf = grids.noise_var_to_time_form(x, noise_flat)  # (Nt, Ns)
    return (As_t, offs_t, Qs_t, Hs_t, hs_t), Kr, x0_t, noise_tf, dtype


def _step(carry, sl, Kr):
    """One predict+update in component-major factored form.

    carry = (m (Dt, Ns), P (Dt, Dt, Ns, Ns), acc_lml). The temporal
    component axes lead and the (Ns, Ns) spatial tiles trail, so the tiny
    Dt contractions unroll into scalar-weighted adds of vector-register-
    friendly (Ns, Ns) tiles (cf. ops/lanes.py for the scalar-emission
    analogue) and the covariance downdate becomes Dt(Dt+1)/2 plain
    (Ns, Ns) matmuls on the MXU.
    """
    m, P, acc = carry
    (A, a, Q, h, hoff), (yt, sd) = sl
    Ns = Kr.shape[0]
    Dt = m.shape[0]

    # predict: m'[a] = sum_c A[a,c] m[c] + a[a];
    #          P'[a,b] = sum_{c,d} A[a,c] A[b,d] P[c,d] + Q[a,b] * Kr
    m_p = [sum(A[i, c] * m[c] for c in range(Dt)) + a[i] for i in range(Dt)]
    AP = [
        [sum(A[i, c] * P[c, d] for c in range(Dt)) for d in range(Dt)]
        for i in range(Dt)
    ]
    P_p = [
        [
            sum(AP[i][d] * A[j, d] for d in range(Dt)) + Q[i, j] * Kr
            for j in range(Dt)
        ]
        for i in range(Dt)
    ]

    # update: innovation S = sum_{a,b} h[a] h[b] P'[a,b] + diag(sd)
    mu = sum(h[i] * m_p[i] for i in range(Dt)) + hoff          # (Ns,)
    PHt = [sum(h[j] * P_p[i][j] for j in range(Dt)) for i in range(Dt)]
    S = sum(h[i] * PHt[i] for i in range(Dt))
    S = psd.symmetrize(S) + sd[None, :] * jnp.eye(Ns, dtype=Kr.dtype)
    L = psd.cholesky(S)
    resid = yt - mu
    alpha = psd.chol_solve(L, resid[:, None])[:, 0]
    lml = -0.5 * (
        Ns * math.log(2 * math.pi)
        + 2 * jnp.sum(jnp.log(jnp.diagonal(L)))
        + resid @ alpha
    )
    m_f = jnp.stack([m_p[i] + PHt[i] @ alpha for i in range(Dt)])
    # downdate via V[a] = L^{-1} PHt[a]^T: P'' = P' - V^T V (symmetric in a,b)
    V = [psd.tri_solve(L, PHt[i].T) for i in range(Dt)]
    rows = [[None] * Dt for _ in range(Dt)]
    for i in range(Dt):
        for j in range(i, Dt):
            down = _mTm(V[i], V[j])
            Pf_ij = P_p[i][j] - down
            rows[i][j] = Pf_ij
            if j > i:
                rows[j][i] = P_p[j][i] - down.T
    P_f = jnp.stack([jnp.stack(r) for r in rows])
    # keep P[a,b]^T == P[b,a] exactly (the (s,t) symmetry of the full cov)
    P_f = 0.5 * (P_f + jnp.transpose(P_f, (1, 0, 3, 2)))
    return None, (m_f, P_f, acc + lml)


def _mTm(X, Y):
    return X.T @ Y


def marginals(fx):
    """Per-observation prior marginal (means, vars) incl. observation noise,
    in time form (Nt, Ns) — factored counterpart of
    lgssm.marginals_diag on the materialised grid model (the API layer
    flattens to the reference's space-fastest flat form). The covariance
    recursion is pure predict (no update): O(Dt^4 Ns^2) per step vs the
    materialised O(Ns^3 Dt^3)."""
    (As_t, offs_t, Qs_t, Hs_t, hs_t), Kr, x0_t, noise_tf, dtype = _factors(fx)
    x = fx.x
    Ns = Kr.shape[0]
    Dt = x0_t.mean.shape[-1]

    m0 = jnp.broadcast_to(x0_t.mean[:, None], (Dt, Ns)).astype(dtype)
    P0 = (
        psd.symmetrize(x0_t.cov)[:, :, None, None] * Kr[None, None, :, :]
    ).astype(dtype)

    def step(carry, sl):
        m, P = carry
        (A, a, Q, h, hoff), sd = sl
        m_p = [
            sum(A[i, c] * m[c] for c in range(Dt)) + a[i] for i in range(Dt)
        ]
        AP = [
            [sum(A[i, c] * P[c, d] for c in range(Dt)) for d in range(Dt)]
            for i in range(Dt)
        ]
        P_p = [
            [
                sum(AP[i][d] * A[j, d] for d in range(Dt)) + Q[i, j] * Kr
                for j in range(Dt)
            ]
            for i in range(Dt)
        ]
        mu = sum(h[i] * m_p[i] for i in range(Dt)) + hoff          # (Ns,)
        var = (
            sum(
                h[i] * h[j] * jnp.diagonal(P_p[i][j])
                for i in range(Dt)
                for j in range(Dt)
            )
            + sd
        )
        P_new = jnp.stack([jnp.stack(r) for r in P_p])
        P_new = 0.5 * (P_new + jnp.transpose(P_new, (1, 0, 3, 2)))
        return (mu, var), (jnp.stack(m_p), P_new)

    params = ((As_t, offs_t, Qs_t, Hs_t, hs_t), noise_tf)
    with precision_ctx(Ns * Dt):
        (mus, vars_), _ = scan_emit(step, params, (m0, P0))
    return mus, vars_


def rand(key, fx):
    """Joint prior sample on the grid in time form (Nt, Ns), keeping the
    transition/initial covariances factored: chol(Q_t (x) Kr) =
    root(Q_t) (x) chol(Kr), so a sample step is two thin matmuls
    (O(Ns^2 Dt + Ns Dt^2)) instead of a materialised (Ns Dt)^2 matvec.
    Randomness is pre-drawn outside the scan (reference design:
    src/models/lgssm.jl:71-77)."""
    from ..utils.fill import Fill, is_fill

    (As_t, offs_t, Qs_t, Hs_t, hs_t), Kr, x0_t, noise_tf, dtype = _factors(fx)
    x = fx.x
    Ns = Kr.shape[0]
    Dt = x0_t.mean.shape[-1]
    Nt = grids.n_time(x)
    L_Kr = psd.cholesky(Kr)

    # Fill-aware root of the temporal process noise (once for regular data).
    if is_fill(Qs_t):
        Lq_t = Fill(psd.psd_root(Qs_t.value), Qs_t.N)
    else:
        Lq_t = psd.psd_root(Qs_t)

    k0, kt, ke = jax.random.split(key, 3)
    z0 = jax.random.normal(k0, (Dt, Ns), dtype)
    eps_t = jax.random.normal(kt, (Nt, Dt, Ns), dtype)
    eps_e = jax.random.normal(ke, (Nt, Ns), dtype)

    x_init = (
        jnp.broadcast_to(x0_t.mean[:, None], (Dt, Ns))
        + psd.psd_root(x0_t.cov) @ z0 @ L_Kr.T
    ).astype(dtype)

    def step(m, sl):
        (A, a, Lq, h, hoff), (et, ee, sd) = sl
        noise = (Lq @ et) @ L_Kr.T                              # (Dt, Ns)
        m_new = A @ m + a[:, None] + noise
        yt = jnp.einsum("i,is->s", h, m_new) + hoff + jnp.sqrt(sd) * ee
        return yt, m_new

    params = ((As_t, offs_t, Lq_t, Hs_t, hs_t), (eps_t, eps_e, noise_tf))
    with precision_ctx(Ns * Dt):
        ys, _ = scan_emit(step, params, x_init)
    return ys


def logpdf(fx, y):
    """Log marginal likelihood of a flat-form y on the grid; NaN = missing
    (same semantics as the generic path, gp/lti_sde.logpdf)."""
    (As_t, offs_t, Qs_t, Hs_t, hs_t), Kr, x0_t, noise_tf, dtype = _factors(fx)
    x = fx.x
    Ns = Kr.shape[0]
    Dt = x0_t.mean.shape[-1]

    y_tf = grids.observations_to_time_form(x, jnp.asarray(y, dtype))
    sd, y_f, n_missing = fill_in_missings(noise_tf, y_tf)
    comp = _volume_compensation(n_missing, dtype)

    m0 = jnp.broadcast_to(x0_t.mean[:, None], (Dt, Ns)).astype(dtype)
    P0 = (psd.symmetrize(x0_t.cov)[:, :, None, None] * Kr[None, None, :, :]).astype(dtype)

    params = ((As_t, offs_t, Qs_t, Hs_t, hs_t), (y_f, sd))
    with precision_ctx(Ns * Dt):
        _, (_, _, total) = scan_emit(
            lambda c, s: _step(c, s, Kr),
            params,
            (m0, P0, jnp.zeros((), dtype)),
        )
    return total + comp


# ---------------------------------------------------------------------------
# Posterior marginals (RTS smoother on the factored filter)
# ---------------------------------------------------------------------------


def _step_post(carry, sl, Kr):
    """kron._step plus per-step emission of the filter/prediction moments
    the RTS smoother needs (materialised (D, D) layout, space-major state
    ordering s*Dt + a — matching to_gauss_markov's I_Ns (x) A_t)."""
    m, P, acc = carry
    _, (m_f, P_f, acc_new) = _step((m, P, acc), sl, Kr)
    (A, a, Q, h, hoff), (yt, sd) = sl
    Dt, Ns = m.shape
    # the predicted moments of THIS step (recomputed cheaply: the predict
    # half of _step; factored contractions, no (D, D) work)
    m_p = jnp.stack(
        [sum(A[i, c] * m[c] for c in range(Dt)) + a[i] for i in range(Dt)]
    )
    AP = [
        [sum(A[i, c] * P[c, d] for c in range(Dt)) for d in range(Dt)]
        for i in range(Dt)
    ]
    P_p = jnp.stack([
        jnp.stack([
            sum(AP[i][d] * A[j, d] for d in range(Dt)) + Q[i, j] * Kr
            for j in range(Dt)
        ])
        for i in range(Dt)
    ])
    return (m_f, P_f, m_p, P_p), (m_f, P_f, acc_new)


def _to_dense(P_fact):
    """(Dt, Dt, Ns, Ns)[, leading batch] -> (Ns*Dt, Ns*Dt), space-major."""
    # indices [.., a, b, s, t] -> [.., s*Dt + a, t*Dt + b]
    ndim = P_fact.ndim
    perm = list(range(ndim - 4)) + [ndim - 2, ndim - 4, ndim - 1, ndim - 3]
    Pm = jnp.transpose(P_fact, perm)  # (..., Ns, Dt, Ns, Dt)
    s = Pm.shape
    return Pm.reshape(s[:-4] + (s[-4] * s[-3], s[-2] * s[-1]))


def posterior_marginals(fx, y, *, noise_pred=None):
    """Observation-space smoothed marginals (means, vars) in TIME form
    (Nt, Ns) — the factored counterpart of
    marginals_diag(posterior_with_missings(...)) on the materialised grid
    model (reference semantics: src/models/lgssm.jl:193-240).

    Hybrid schedule (docs/ROADMAP.md item 7): the forward filter runs fully
    factored (the kron win: O(Ns^2 Dt^3) predict, (Ns, Ns) innovation
    algebra), per-step filter/prediction moments are stacked, the smoother
    gains come from ONE batched (Nt, D, D) Cholesky, and the backward
    covariance recursion is two (D, D) MXU matmuls per step emitting only
    the (Ns,) observation-space variance diagonal. A FULLY factored
    smoother is blocked for a structural reason: P_pred = (I (x) A) P_f
    (I (x) A)' + Kr (x) Q has no Kronecker (or low-rank-correction)
    structure because P_f is general, so the gain solve inherently needs
    full-state factorisations; batching them across time is the TPU-native
    answer (one custom call, not Nt sequential ones).

    Memory: stacks 2 x Nt x D^2 floats (e.g. 440 MB at Ns=247, Nt=100,
    f32). noise_pred: optional (Nt, Ns) observation-noise variances used
    for the reported marginals (prediction noise) in place of the training
    noise; NaNs in y mark missing observations (large-variance fill).
    """
    from ..config import POSTERIOR_JITTER

    (As_t, offs_t, Qs_t, Hs_t, hs_t), Kr, x0_t, noise_tf, dtype = _factors(fx)
    x = fx.x
    Ns = Kr.shape[0]
    Dt = x0_t.mean.shape[-1]
    D = Ns * Dt
    Nt = grids.n_time(x)

    y_tf = grids.observations_to_time_form(x, jnp.asarray(y, dtype))
    sd, y_f, _ = fill_in_missings(noise_tf, y_tf)

    m0 = jnp.broadcast_to(x0_t.mean[:, None], (Dt, Ns)).astype(dtype)
    P0 = (
        psd.symmetrize(x0_t.cov)[:, :, None, None] * Kr[None, None, :, :]
    ).astype(dtype)

    params = ((As_t, offs_t, Qs_t, Hs_t, hs_t), (y_f, sd))
    with precision_ctx(D):
        (m_fs, P_fs, m_ps, P_ps), _ = scan_emit(
            lambda c, s: _step_post(c, s, Kr),
            params,
            (m0, P0, jnp.zeros((), dtype)),
        )

        # materialise (space-major) and build the gains in one batched pass:
        # J_t = P_f[t] A' P_pred[t+1]^{-1}, t = 0..Nt-2
        from ..utils.fill import tmaterialize

        A_all = tmaterialize(As_t)                    # (Nt, Dt, Dt)
        P_f_d = _to_dense(P_fs)                       # (Nt, D, D)
        P_p_d = _to_dense(P_ps)
        m_f_d = jnp.reshape(jnp.swapaxes(m_fs, -2, -1), (Nt, D))
        m_p_d = jnp.reshape(jnp.swapaxes(m_ps, -2, -1), (Nt, D))

        # (P_f A')[s*Dt+a, t*Dt+b] = sum_d P_f[a,d,s,t] A[b,d] (factored)
        PfA = _to_dense(
            jnp.einsum("nadst,nbd->nabst", P_fs[:-1], A_all[1:])
        )                                             # (Nt-1, D, D)
        Lp = psd.cholesky(
            psd.add_jitter(psd.symmetrize(P_p_d[1:]), POSTERIOR_JITTER)
        )
        J = jnp.swapaxes(
            psd.chol_solve(Lp, jnp.swapaxes(PfA, -1, -2)), -1, -2
        )                                             # (Nt-1, D, D)

        # emission projection operators, time form
        H_all = tmaterialize(Hs_t)                    # (Nt, Dt)
        hoff_all = tmaterialize(hs_t)                 # (Nt,)
        # default matches marginals_diag(posterior_with_missings(...)): the
        # reported noise is the FILLED per-step variance (large at missing
        # points); noise_pred overrides with prediction noise (the
        # replace_observation_noise_cov semantics of gp/posterior).
        sd_rep = sd if noise_pred is None else jnp.asarray(noise_pred, dtype)

        def proj(m_d, P_d, h, hoff, sdt):
            # m_d (D,), P_d (D, D) space-major; h (Dt,). var[s] is the
            # h-projection of the s-th diagonal (Dt, Dt) block.
            mv = m_d.reshape(Ns, Dt) @ h + hoff       # (Ns,)
            Pb = P_d.reshape(Ns, Dt, Ns, Dt)
            diag_blocks = Pb[jnp.arange(Ns), :, jnp.arange(Ns), :]  # (Ns,Dt,Dt)
            var = jnp.einsum("a,sab,b->s", h, diag_blocks, h)
            return mv, var + sdt

        # backward smoother: carry (m_s (D,), P_s (D, D))
        def back(carry, sl):
            m_s, P_s = carry
            J_t, m_f_t, P_f_t, m_p_n, P_p_n, h, hoff, sdt = sl
            m_new = m_f_t + J_t @ (m_s - m_p_n)
            P_new = psd.symmetrize(
                P_f_t + J_t @ (P_s - P_p_n) @ J_t.T
            )
            mv, var = proj(m_new, P_new, h, hoff, sdt)
            return (m_new, P_new), (mv, var)

        m_last, P_last = m_f_d[-1], P_f_d[-1]
        mv_l, var_l = proj(m_last, P_last, H_all[-1], hoff_all[-1],
                           sd_rep[-1])
        sls = (
            jnp.flip(J, 0), jnp.flip(m_f_d[:-1], 0), jnp.flip(P_f_d[:-1], 0),
            jnp.flip(m_p_d[1:], 0), jnp.flip(P_p_d[1:], 0),
            jnp.flip(H_all[:-1], 0), jnp.flip(hoff_all[:-1], 0),
            jnp.flip(sd_rep[:-1], 0),
        )
        _, (mv_r, var_r) = jax.lax.scan(back, (m_last, P_last), sls)
        mus = jnp.concatenate([jnp.flip(mv_r, 0), mv_l[None]], axis=0)
        vars_ = jnp.concatenate([jnp.flip(var_r, 0), var_l[None]], axis=0)
    return mus, vars_
