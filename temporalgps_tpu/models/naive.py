"""Naive dense-Gaussian oracle for LGSSMs.

The reference's central correctness strategy is oracle testing against the
naive O(N^3) dense GP (reference: test/gp/lti_sde.jl:179-201). At the model
layer we need the same thing for arbitrary LGSSMs: this module composes the
Markov chain explicitly into one joint Gaussian over all observations using
NumPy float64, giving logpdf / marginals / posterior references that the scan
engines must match to ~1e-8. Test-only; never used in the hot path.
"""

import numpy as np

from ..utils.fill import time_length, tindex
from . import emissions as em
from .lgssm import LGSSM


def _effective_emission(e_t):
    """Per-step (A_eff, a_eff, Sigma_dense) of any emission variant."""
    if isinstance(e_t, em.ScalarEmissions):
        A = np.asarray(e_t.H)[None, :]
        a = np.atleast_1d(np.asarray(e_t.h))
        S = np.atleast_2d(np.asarray(e_t.s))
        return A, a, S
    if isinstance(e_t, em.DenseEmissions):
        return np.asarray(e_t.H), np.asarray(e_t.h), np.asarray(e_t.S)
    if isinstance(e_t, em.LargeEmissions):
        return np.asarray(e_t.C), np.asarray(e_t.c), np.diag(np.asarray(e_t.s_diag))
    if isinstance(e_t, em.BottleneckEmissions):
        C, H = np.asarray(e_t.C), np.asarray(e_t.H)
        A = C @ H
        a = C @ np.asarray(e_t.h) + np.asarray(e_t.c)
        return A, a, np.diag(np.asarray(e_t.s_diag))
    raise TypeError(type(e_t))


def joint_observation_gaussian(model: LGSSM):
    """Mean and covariance of the flat vector of all observations, ordered by
    time index (not iteration order)."""
    N = len(model)
    forward = model.trans.forward
    order = list(range(N)) if forward else list(range(N - 1, -1, -1))

    # Latent chain states s_0..s_N in iteration order: s_0 ~ x0, and
    # s_{k+1} = trans[order[k]](s_k). Emission at iteration k reads state
    # s_{k+1} under Forward ordering (transition first, then emit,
    # reference: lgssm.jl:81-84,105-108) and s_k under Reverse ordering
    # (emit first, then transition, reference: lgssm.jl:87-90,111-114).
    Ms = [np.asarray(model.trans.x0.mean, dtype=np.float64)]
    covs = {(0, 0): np.asarray(model.trans.x0.cov, dtype=np.float64)}
    for k, t in enumerate(order):
        A = np.asarray(tindex(model.trans.As, t), dtype=np.float64)
        a = np.asarray(tindex(model.trans.offs, t), dtype=np.float64)
        Q = np.asarray(tindex(model.trans.Qs, t), dtype=np.float64)
        i = k + 1
        Ms.append(A @ Ms[k] + a)
        covs[(i, i)] = A @ covs[(k, k)] @ A.T + Q
        for j in range(i):
            covs[(i, j)] = A @ covs[(k, j)] if j < k else A @ covs[(k, k)]

    # Emissions in iteration order.
    As_e, as_e, Ss_e, dims = [], [], [], []
    for t in order:
        A_e, a_e, S_e = _effective_emission(tindex(model.emis, t))
        As_e.append(A_e)
        as_e.append(a_e)
        Ss_e.append(S_e)
        dims.append(A_e.shape[0])

    def state_of(k):
        return k + 1 if forward else k

    total = sum(dims)
    offsets = np.concatenate([[0], np.cumsum(dims)])
    mean = np.zeros(total)
    cov = np.zeros((total, total))
    for k in range(N):
        sk = slice(offsets[k], offsets[k + 1])
        ik = state_of(k)
        mean[sk] = As_e[k] @ Ms[ik] + as_e[k]
        cov[sk, sk] = As_e[k] @ covs[(ik, ik)] @ As_e[k].T + Ss_e[k]
        for j in range(k):
            sj = slice(offsets[j], offsets[j + 1])
            ij = state_of(j)
            block = As_e[k] @ covs[(ik, ij)] @ As_e[j].T
            cov[sk, sj] = block
            cov[sj, sk] = block.T

    # Scatter from iteration order back to time order.
    if not model.trans.forward:
        perm = []
        time_slices = {}
        for k, t in enumerate(order):
            time_slices[t] = list(range(offsets[k], offsets[k + 1]))
        for t in range(N):
            perm.extend(time_slices[t])
        perm = np.asarray(perm)
        mean = mean[perm]
        cov = cov[np.ix_(perm, perm)]

    dims_time = np.asarray([dims[order.index(t)] for t in range(N)])
    return mean, cov, dims_time


def naive_logpdf(model: LGSSM, y):
    mean, cov, _ = joint_observation_gaussian(model)
    yv = np.asarray(y, dtype=np.float64).reshape(-1)
    d = yv - mean
    L = np.linalg.cholesky(cov)
    alpha = np.linalg.solve(L, d)
    return float(
        -0.5 * (len(yv) * np.log(2 * np.pi) + 2 * np.sum(np.log(np.diag(L))) + alpha @ alpha)
    )


def naive_marginals(model: LGSSM):
    """Per-time observation-space marginal (means list, covs list)."""
    mean, cov, dims = joint_observation_gaussian(model)
    offsets = np.concatenate([[0], np.cumsum(dims)])
    means = [mean[offsets[t] : offsets[t + 1]] for t in range(len(dims))]
    covs = [
        cov[offsets[t] : offsets[t + 1], offsets[t] : offsets[t + 1]]
        for t in range(len(dims))
    ]
    return means, covs


def naive_posterior_logpdf(model: LGSSM, y, y2):
    """Dense oracle for logpdf(posterior(model, y), y2).

    The posterior LGSSM keeps the prior's emissions (lgssm.posterior,
    reference: src/models/lgssm.jl:193-228), so its logpdf of y2 is
    log p(y2' | y) where y2' is a *fresh* noisy re-observation of the same
    latent chain: joint cov [[A P A' + S, A P A'], [A P A', A P A' + S]]
    with P the dense latent joint — independent noise on each copy."""
    assert model.trans.forward, "oracle implemented for Forward priors"
    N = len(model)
    mean, cov, dims = joint_observation_gaussian(model)
    from ..utils.fill import Fill
    from .emissions import DenseEmissions

    D = model.latent_dim
    ident = LGSSM(
        model.trans,
        DenseEmissions(
            H=Fill(np.eye(D), N), h=Fill(np.zeros(D), N), S=Fill(np.zeros((D, D)), N)
        ),
    )
    _, lat_cov, _ = joint_observation_gaussian(ident)

    offsets = np.concatenate([[0], np.cumsum(dims)])
    total = offsets[-1]
    # Noise-free observation joint: A_e lat_cov A_e' blockwise.
    As_e = [
        _effective_emission(tindex(model.emis, t))[0] for t in range(N)
    ]
    C = np.zeros((total, total))
    for ti in range(N):
        si = slice(offsets[ti], offsets[ti + 1])
        for tj in range(N):
            sj = slice(offsets[tj], offsets[tj + 1])
            C[si, sj] = As_e[ti] @ lat_cov[ti * D : (ti + 1) * D, tj * D : (tj + 1) * D] @ As_e[tj].T

    yv = np.asarray(y, dtype=np.float64).reshape(-1)
    y2v = np.asarray(y2, dtype=np.float64).reshape(-1)
    sol = np.linalg.solve(cov, yv - mean)
    cond_mean = mean + C @ sol
    cond_cov = cov - C @ np.linalg.solve(cov, C.T)
    d = y2v - cond_mean
    L = np.linalg.cholesky(cond_cov)
    alpha = np.linalg.solve(L, d)
    return float(
        -0.5 * (len(y2v) * np.log(2 * np.pi) + 2 * np.sum(np.log(np.diag(L))) + alpha @ alpha)
    )


def naive_posterior_marginals(model: LGSSM, y):
    """Observation-space posterior marginals of the *noisy* observation
    process conditioned on y: mean/cov per time step via dense conditioning
    of the latent joint, then re-emission."""
    assert model.trans.forward, "oracle posterior implemented for Forward priors"
    N = len(model)
    # Build joint over latents AND observations: easier — condition obs joint?
    # We need latent posterior then emission predictive. Build latent joint by
    # using identity emissions trick: treat latents as extra observations.
    mean, cov, dims = joint_observation_gaussian(model)
    yv = np.asarray(y, dtype=np.float64).reshape(-1)
    # Latent joint via augmentation: rebuild with emission = identity, no noise
    from .emissions import DenseEmissions
    from ..utils.fill import Fill

    D = model.latent_dim
    ident = LGSSM(
        model.trans,
        DenseEmissions(
            H=Fill(np.eye(D), N), h=Fill(np.zeros(D), N), S=Fill(np.zeros((D, D)), N)
        ),
    )
    lat_mean, lat_cov, _ = joint_observation_gaussian(ident)

    # Cross-covariance latents x observations: emit one side.
    # cov(x_flat, y_flat) = lat-lat cov times emission^T blockwise.
    order = range(N)
    As_e, as_e, Ss_e = [], [], []
    for t in order:
        A_e, a_e, S_e = _effective_emission(tindex(model.emis, t))
        As_e.append(A_e)
        as_e.append(a_e)
        Ss_e.append(S_e)
    offsets_y = np.concatenate([[0], np.cumsum(dims)])
    cross = np.zeros((N * D, len(yv)))
    for tj in range(N):
        sj = slice(offsets_y[tj], offsets_y[tj + 1])
        for ti in range(N):
            si = slice(ti * D, (ti + 1) * D)
            cross[si, sj] = lat_cov[si, tj * D : (tj + 1) * D] @ As_e[tj].T
    # Condition latents on y.
    Ky = cov
    d = yv - mean
    sol = np.linalg.solve(Ky, d)
    lat_post_mean = lat_mean + cross @ sol
    lat_post_cov = lat_cov - cross @ np.linalg.solve(Ky, cross.T)
    # Emission predictive per step.
    means, covs = [], []
    for t in range(N):
        st = slice(t * D, (t + 1) * D)
        mt = As_e[t] @ lat_post_mean[st] + as_e[t]
        Pt = As_e[t] @ lat_post_cov[st, st] @ As_e[t].T + Ss_e[t]
        means.append(mt)
        covs.append(Pt)
    return means, covs
