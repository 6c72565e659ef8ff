"""Time-invariant (Fill-parameter) blocked Kalman engine.

For models whose transition AND emission parameters are all `Fill`s (the
RegularSpacing fast path, reference: src/gp/lti_sde.jl:148-160 — and its
spatio-temporal/DTC grid descendants), the Kalman COVARIANCE recursion is
data-independent: every per-step filtering element shares the same
(A, C, J) components, only the (b, eta) components are (linearly) driven by
the data. This engine exploits that structure end-to-end:

  1. covariance pass — the filtering state covariance at EVERY step is the
     prior composed with the t-th power of the constant element:
        within-block powers  E^1..E^L   (one tiny unbatched L-scan)
        block-start powers   E^(bL)     (log2 B batched combines)
        all-step states      combine(prior∘E^(bL), E^l)  — ONE (B, L)-batched
                             combine pass, pure MXU matmuls
     No per-step Cholesky inside any scan.
  2. data pass — the filtering mean recursion m_t = G_t m_{t-1} + w_t has
     PRECOMPUTED position-dependent coefficients (G_t from the covariance
     pass) and data terms w_t that are one (N, Dout) x (Dout, D) matmul;
     the recursion solves with the blocked affine engine
     (ops/block.affine_prefix_states).
  3. lml — vectorised over all N steps from the predicted means/covs via
     the input-space (LargeOutputLGC-style) identities; all Choleskys are
     D-dim and batched over N outside any scan.

The sequential engine computes the same quantities step-by-step
(reference: src/models/lgssm.jl:147-165); this engine is a TPU-native
re-design with O(L + log B) scan depth and all heavy math in fat batched
matmuls. Missing data is NOT supported here (the large-variance fill makes
the noise leaf time-varying, breaking the premise) — callers must route
models with missings to the generic engines.
"""

import jax
import jax.numpy as jnp

from ..models import emissions as em
from ..utils import psd
from ..utils.fill import Fill, is_fill
from ..utils.gaussian import Gaussian
from . import assoc

# peak bytes of outer-combine temporaries before the B axis is chunked
_COV_CHUNK_BYTES = 1 << 29  # ~512MB


def _mT(X):
    return jnp.swapaxes(X, -1, -2)


def supported(model) -> bool:
    if not model.trans.forward:
        return False
    t = model.trans
    leaves = [t.As, t.offs, t.Qs]
    leaves += [
        getattr(model.emis, f.name)
        for f in type(model.emis).__dataclass_fields__.values()
    ]
    return all(is_fill(l) for l in leaves)


def _single(tree):
    """Fill leaves -> their unbatched values."""
    return jax.tree.map(lambda l: l.value if is_fill(l) else l, tree,
                        is_leaf=is_fill)


def _ident_elem(D, dtype):
    return (
        jnp.eye(D, dtype=dtype),
        jnp.zeros((D,), dtype),
        jnp.zeros((D, D), dtype),
        jnp.zeros((D,), dtype),
        jnp.zeros((D, D), dtype),
    )


def _all_powers(E1, L, combine):
    """E^1..E^L (batched on axis 0) by binary doubling: each level is ONE
    width-m batched combine, so depth is log2 L instead of L. Under f64
    emulation a length-L lax.scan pays L x (ops-per-combine x ~20) per-op
    dispatch (~13 ms at L=32 on v5e); this form is ~log2 L fat combines."""
    E_pows = jax.tree.map(lambda x: x[None], E1)
    m = 1
    while m < L:
        E_m = jax.tree.map(lambda x: x[m - 1], E_pows)
        take = min(m, L - m)
        head = jax.tree.map(lambda x: x[:take], E_pows)
        E_m_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (take,) + x.shape), E_m
        )
        nxt = combine(E_m_b, head)  # E^(m+1)..E^(m+take)
        E_pows = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), E_pows, nxt
        )
        m += take
    return E_pows


def _const_element(model, dtype):
    """The shared per-step filtering element at y=0 (only its data-free
    (A, C, J) components are consumed). Uses the same element constructor as
    the generic engines (ops/block._step_element)."""
    from . import block

    D = model.latent_dim
    e_single = _single(model.emis)
    A0 = model.trans.As.value.astype(dtype)
    a0 = model.trans.offs.value.astype(dtype)
    Q0 = model.trans.Qs.value.astype(dtype)

    if isinstance(model.emis, em.ScalarEmissions):
        y0 = jnp.zeros((), dtype)
    else:
        y0 = jnp.zeros((em.dim_out(model.emis),), dtype)

    e0 = block._step_element((((A0, a0, Q0), e_single), y0), D, dtype)
    return e0, (A0, a0, Q0), e_single


def _cov_chain(model, N, B, dtype, hi_mode=None):
    """The constant-element power chain shared by the row-layout and
    component-major covariance passes: within-block powers E^1..E^L,
    block-start powers composed with the prior.

    Returns (St, E_pows, e0, trans0, e_single) where St is the (B,)-batched
    prior-composed block-start element and E_pows the (L,)-batched element
    powers, both already cast per `hi_mode` ("chain" casts them down to
    `dtype`; "full" leaves them in f64 for an f64 outer combine)."""
    D = model.latent_dim
    L = N // B
    assert B * L == N, (N, B)
    hi = jnp.float64 if hi_mode and jax.config.jax_enable_x64 else dtype
    # latency_mode over the thin-batched chain (the L-power doubling and
    # log2(B) block-start levels): at warmup shapes (L=32, B=16) every
    # level's small chol/tri_solve would otherwise be an XLA custom call,
    # each ~0.5-1 ms of latency — see utils/psd.latency_mode.
    with psd.latency_mode():
        e0, trans0, e_single = _const_element(model, hi)
        E1 = (e0[0], jnp.zeros((D,), hi), e0[2], jnp.zeros((D,), hi), e0[4])

        # within-block powers E^1..E^L by binary doubling (see _all_powers)
        E_pows = _all_powers(E1, L, assoc._combine_filter)
        E_L = jax.tree.map(lambda x: x[-1], E_pows)

        # block-start powers E^(bL), b = 0..B-1 (identity at b=0)
        if B > 1:
            E_L_b = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (B - 1,) + x.shape), E_L
            )
            S = jax.lax.associative_scan(assoc._combine_filter, E_L_b, axis=0)
            ident_b = jax.tree.map(lambda x: x[None], _ident_elem(D, hi))
            S = jax.tree.map(
                lambda i, s: jnp.concatenate([i, s], axis=0), ident_b, S
            )
        else:
            S = jax.tree.map(lambda x: x[None], _ident_elem(D, hi))

        # prior-composed block starts
        x0 = model.trans.x0
        prior = (
            jnp.zeros((D, D), hi),
            x0.mean.astype(hi),
            psd.symmetrize(x0.cov).astype(hi),
            jnp.zeros((D,), hi),
            jnp.zeros((D, D), hi),
        )
        prior_b = jax.tree.map(lambda x: x[None], prior)
        St = assoc._combine_filter(prior_b, S)  # (B, ...)

    if hi != dtype and hi_mode == "chain":
        St = jax.tree.map(lambda x: x.astype(dtype), St)
        E_pows = jax.tree.map(lambda x: x.astype(dtype), E_pows)
    if hi != dtype:
        e0 = jax.tree.map(lambda x: x.astype(dtype), e0)
        trans0 = tuple(x.astype(dtype) for x in trans0)
        e_single = jax.tree.map(
            lambda l: l.astype(dtype)
            if jnp.issubdtype(l.dtype, jnp.floating) else l,
            e_single,
        )
    return St, E_pows, e0, trans0, e_single


def _cov_pass(model, N, B, dtype, hi_mode=None):
    """Filtering covariance at every step via constant-element powers.

    Returns (P_f (N, D, D) with P_f[t] = filtering cov after step t+1,
    e0, trans values, single emission). N must equal B*L exactly.

    hi_mode: None (all work in `dtype`), "chain" (only the DEEP
    compositions — the L-step power scan and the log2(B) block-start scan —
    run in f64, cast down before the depth-1 batched outer combine), or
    "full" (the whole pass in f64, cast on return). Reverse-mode through
    the f32 power chain loses gradient accuracy linearly in chain depth
    (measured ~5e-5/step rel at D=5); "chain" removes the depth-growing
    term leaving a flat ~3e-3 rel residual, "full" reaches ~4e-5 at the
    cost of f64 for the O(N) outer combine too. Callers pick by how much
    f64 (TPU-emulated, ~10-30x) they can afford; the steady warmup uses
    "full" (its N is the small warmup length).
    """
    St, E_pows, e0, trans0, e_single = _cov_chain(model, N, B, dtype, hi_mode)
    D = model.latent_dim
    L = N // B

    Ep_e = jax.tree.map(lambda x: x[None], E_pows)      # (1, L, ...)

    # The outer combine's temporaries are ~10 (B, L, D, D) tensors; chunk
    # the B axis so peak memory stays bounded (N=1e6 at D=19 otherwise
    # needs ~18GB of HBM). Only the C-component is kept.
    # under hi_mode="full" the outer combine runs in `hi` (f64): scale the
    # chunk budget by the actual element itemsize or peak memory doubles
    elem_bytes = 10 * L * D * D * jnp.dtype(St[0].dtype).itemsize
    C = B
    while C > 1 and C * elem_bytes > _COV_CHUNK_BYTES:
        C //= 2
    while B % C:  # the lax.map reshape needs C | B (B=25 halves to 12)
        C -= 1

    def chunk_cov(st_chunk):
        st_e = jax.tree.map(lambda x: x[:, None], st_chunk)  # (C, 1, ...)
        return assoc._combine_filter(st_e, Ep_e)[2]          # (C, L, D, D)

    if C == B:
        P_f = chunk_cov(St).reshape((N, D, D))
    else:
        St_c = jax.tree.map(
            lambda x: x.reshape((B // C, C) + x.shape[1:]), St
        )
        P_f = jax.lax.map(chunk_cov, St_c).reshape((N, D, D))
    return P_f.astype(dtype), e0, trans0, e_single


def _gain_ops_vector(P_pred, H, R_isqrt_fn, dtype):
    """Batched input-space gain/lml operators for vector emissions.

    H (Dout, D) constant; R_isqrt_fn(v) applies R^{-1/2}-weighting to a
    (..., Dout) or (Dout, k) operand (diagonal or dense-constant noise).
    Returns dict with Lpp, Lf, T (all (N, D, D)) and logdetS_core (N,).
    """
    from ..config import POSTERIOR_JITTER

    Hw = R_isqrt_fn(H)  # R^{-1/2} H  (Dout, D)
    Gram = psd.symmetrize(_mT(Hw) @ Hw)  # H' R^{-1} H (D, D) const
    Lpp = psd.cholesky(psd.add_jitter(psd.symmetrize(P_pred), POSTERIOR_JITTER))
    T = _mT(Lpp) @ Gram  # (N, D, D)
    Fm = psd.symmetrize(T @ Lpp) + jnp.eye(P_pred.shape[-1], dtype=dtype)
    Lf = psd.cholesky(Fm)
    logdetFm = psd.logdet_from_chol(Lf)
    return dict(Hw=Hw, Gram=Gram, Lpp=Lpp, T=T, Lf=Lf, logdetFm=logdetFm)


def _HtSinv_apply(ops, u):
    """H' S^{-1} r from u = H' R^{-1} r: u - T' Fm^{-1} (Lpp' u); batched."""
    Lpu = jnp.einsum("...ji,...j->...i", ops["Lpp"], u)
    Fi = psd.chol_solve(ops["Lf"], Lpu[..., None])[..., 0]
    return u - jnp.einsum("...ji,...j->...i", ops["T"], Fi)


def _filter_pass(model, y, n_blocks=None, cov_hi=False):
    """All filtering quantities of a Fill model: means/covs at every step,
    predicted means/covs, and the emission-side operators. Shared by
    logpdf and posterior.

    cov_hi: hi_mode forwarded to _cov_pass (None, "chain", or "full";
    True means "full"). Reverse-mode through the f32 power chain loses
    accuracy linearly in N (measured: hyperparameter-grad rel error ~5e-5
    per step at D=5), so short-N callers that feed gradients — the steady
    engine's warmup — ask for a hi pass; its N is the small warmup length
    so the f64 cost is bounded."""
    from . import block as blk

    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    N = len(model)
    B = min(n_blocks or blk._default_blocks(N, 1), N)
    # exact tail alignment via the large-variance pad would break Fill-ness;
    # choose B dividing N instead (power-of-two fallback to 1 always works)
    while N % B:
        B //= 2
    y = jnp.asarray(y, dtype)

    # Remat the covariance pass: its forward is cheap (data-free batched
    # combines) while its reverse residuals are several (N, D, D) tensors.
    P_f, e0, (A0, a0, Q0), e_single = jax.checkpoint(
        lambda m: _cov_pass(m, N, B, dtype,
                            hi_mode="full" if cov_hi is True else cov_hi),
        static_argnums=()
    )(model)
    P_prev = jnp.concatenate(
        [psd.symmetrize(x0.cov)[None].astype(dtype), P_f[:-1]], axis=0
    )
    P_pred = psd.symmetrize(A0 @ P_prev @ A0.T + Q0)

    scalar = isinstance(model.emis, em.ScalarEmissions)
    if scalar:
        H = e_single.H  # (D,)
        h = e_single.h
        s = e_single.s
        Sv = jnp.einsum("i,nij,j->n", H, P_pred, H) + s  # (N,)
        PH = jnp.einsum("nij,j->ni", P_pred, H)
        K = PH / Sv[:, None]                              # (N, D)
        G = A0 - K[:, :, None] * (H @ A0)[None, None, :]  # (I-KH)A
        # w_t = (I-KH)a + K (y_t - h)
        w = (a0[None] - K * (H @ a0)) + K * (y - h)[:, None]
    else:
        H_eff, h_eff, R_kind, R_payload = _effective_emission(e_single)
        R_isqrt_fn, R_inv_fn, logdetR, quad_R = R_kind_ops(R_kind, R_payload)
        ops = _gain_ops_vector(P_pred, H_eff, R_isqrt_fn, dtype)
        # G = (I - KH)A = A - P_pred M1 A, M1 = H'S^{-1}H batched
        M1 = psd.symmetrize(
            ops["Gram"]
            - _mT(ops["T"]) @ psd.chol_solve(ops["Lf"], ops["T"])
        )
        G = A0[None] - P_pred @ (M1 @ A0[None])
        # w_t = (I-KH)a + K(y_t - h);  K v = P_pred (H'S^{-1} v)
        resid0 = y - h_eff[None]                       # (N, Dout)
        u = jnp.einsum("ji,...j->...i", R_inv_fn(H_eff), resid0)  # H'R^{-1}(y-h)
        Kv = jnp.einsum("nij,nj->ni", P_pred, _HtSinv_apply(ops, u))
        w = (
            a0[None]
            - jnp.einsum("nij,nj->ni", P_pred, M1 @ a0)
            + Kv
        )

    # blocked affine solve of the mean recursion
    means = blk.affine_prefix_states(
        G, w, None, x0.mean.astype(dtype), None, n_blocks=B
    ).mean  # (N, D): filtering means
    m_prev = jnp.concatenate([x0.mean[None].astype(dtype), means[:-1]], axis=0)
    m_pred = jnp.einsum("ij,nj->ni", A0, m_prev) + a0

    out = dict(
        y=y, dtype=dtype, scalar=scalar, trans0=(A0, a0, Q0),
        e_single=e_single, means=means, m_prev=m_prev, m_pred=m_pred,
        P_f=P_f, P_prev=P_prev, P_pred=P_pred,
    )
    if scalar:
        out.update(H=H, h=h, s=s, Sv=Sv)
    else:
        out.update(
            H_eff=H_eff, h_eff=h_eff, ops=ops,
            R_inv_fn=R_inv_fn, logdetR=logdetR, quad_R=quad_R,
        )
    return out


# Component-major layout dispatch for scalar moderate-D models: None = auto
# (TPU backend, scalar emissions, 4 < D <= 48 — where the (8, 128)
# tile-padding tax on (N, D, D) row layout dominates); True/False forces.
CM_LAYOUT = None


def logpdf(model, y, *, n_blocks=None):
    """lml of a Fill-parameter forward model; no missing data."""
    from . import lti_cm

    use_cm = CM_LAYOUT
    if use_cm is None:
        use_cm = (
            jax.default_backend() == "tpu"
            and lti_cm.supported(model)
            and 4 < model.latent_dim <= 48
        )
    if use_cm and lti_cm.supported(model):
        return lti_cm.logpdf(model, y, n_blocks=n_blocks)
    return _lml_from_filter(_filter_pass(model, y, n_blocks))


def _lml_from_filter(q):
    """Sum of per-step lml terms from a `_filter_pass` result (shared with
    the steady-state engine's exact warmup segment, ops/steady.py)."""
    import math

    y, m_pred = q["y"], q["m_pred"]
    if q["scalar"]:
        H, h, Sv = q["H"], q["h"], q["Sv"]
        r = y - (jnp.einsum("i,ni->n", H, m_pred) + h)
        return -0.5 * jnp.sum(
            jnp.log(Sv) + r * r / Sv + math.log(2.0 * math.pi)
        )
    H_eff, h_eff, ops = q["H_eff"], q["h_eff"], q["ops"]
    Dout = y.shape[-1]
    r = y - (jnp.einsum("ij,nj->ni", H_eff, m_pred) + h_eff)
    ur = jnp.einsum("ji,...j->...i", q["R_inv_fn"](H_eff), r)  # H'R^{-1} r
    v = jnp.einsum("nji,nj->ni", ops["Lpp"], ur)
    Fi = psd.chol_solve(ops["Lf"], v[..., None])[..., 0]
    quad = q["quad_R"](r) - jnp.sum(v * Fi, axis=-1)
    return -0.5 * jnp.sum(
        ops["logdetFm"] + q["logdetR"] + quad + Dout * math.log(2.0 * math.pi)
    )


def posterior(model, y, *, n_blocks=None, cov_hi=False):
    """Smoother-as-Reverse-LGSSM for Fill models (reference semantics:
    src/models/lgssm.jl:193-240): lti filter quantities + batched dynamics
    inversion. The returned model's per-step transitions are arrays (the
    reversed dynamics are position-dependent), so downstream drivers use
    the generic engines on it. `cov_hi` as in `_filter_pass` (the steady
    engine's small-N delegation passes it so f32 gradients through the
    delegated posterior keep the hi-precision chain)."""
    from ..config import POSTERIOR_JITTER
    from ..models.gauss_markov import GaussMarkov
    from ..models.lgssm import LGSSM

    q = _filter_pass(model, y, n_blocks, cov_hi=cov_hi)
    A0, _, _ = q["trans0"]
    m_prev, P_prev = q["m_prev"], q["P_prev"]
    m_pred, P_pred = q["m_pred"], q["P_pred"]

    Ppj = psd.add_jitter(P_pred, POSTERIOR_JITTER)
    # gain G = P_prev A' Ppj^{-1}; reversed dynamics as in _invert_dynamics
    Lp = psd.cholesky(Ppj)
    G = _mT(psd.chol_solve(Lp, A0 @ P_prev))       # (N, D, D)
    a_rev = m_prev - jnp.einsum("nij,nj->ni", G, m_pred)
    Q_rev = psd.symmetrize(P_prev - G @ (A0 @ P_prev))
    x_last = Gaussian(q["means"][-1], psd.symmetrize(q["P_f"][-1]))
    new_trans = GaussMarkov(
        As=G, offs=a_rev, Qs=Q_rev, x0=x_last, forward=False,
        det_blocks=model.trans.det_blocks,
    )
    return LGSSM(new_trans, model.emis)


def _effective_emission(e_single):
    """(H_eff, h_eff, R_kind, R_payload) with R_kind in {"diag", "dense"}."""
    if isinstance(e_single, em.LargeEmissions):
        return e_single.C, e_single.c, "diag", e_single.s_diag
    if isinstance(e_single, em.BottleneckEmissions):
        H = e_single.C @ e_single.H
        h = e_single.C @ e_single.h + e_single.c
        return H, h, "diag", e_single.s_diag
    if isinstance(e_single, em.DenseEmissions):
        return e_single.H, e_single.h, "dense", e_single.S
    raise TypeError(type(e_single))


def R_kind_ops(kind, payload):
    """(R_isqrt_fn, R_inv_fn, logdetR, quad_R) for a constant noise."""
    if kind == "diag":
        s = payload  # (Dout,)
        isq = 1.0 / jnp.sqrt(s)
        return (
            lambda X: X * isq[:, None] if X.ndim == 2 else X * isq,
            lambda X: X / s[:, None] if X.ndim == 2 else X / s,
            jnp.sum(jnp.log(s)),
            lambda r: jnp.sum(r * r / s, axis=-1),
        )
    S = payload  # (Dout, Dout) dense
    Ls = psd.cholesky(psd.symmetrize(S))
    logdetR = psd.logdet_from_chol(Ls)

    def isqrt_fn(X):
        return psd.tri_solve(Ls, X if X.ndim == 2 else X[..., None])[
            ..., 0
        ] if X.ndim == 1 else psd.tri_solve(Ls, X)

    def inv_fn(X):
        return psd.chol_solve(Ls, X if X.ndim == 2 else X[..., None])[
            ..., 0
        ] if X.ndim == 1 else psd.chol_solve(Ls, X)

    def quad_fn(r):
        z = psd.tri_solve(Ls, r[..., None])[..., 0]
        return jnp.sum(z * z, axis=-1)

    return isqrt_fn, inv_fn, logdetR, quad_fn


def latent_marginals(model, *, n_blocks=None) -> Gaussian:
    """Prior latent marginals of a Fill model — fully data-free blocked
    affine power composition (no O(N) scan)."""
    from . import block as blk

    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    N = len(model)
    B = min(n_blocks or blk._default_blocks(N, 1), N)
    while N % B:
        B //= 2
    L = N // B

    A0 = model.trans.As.value.astype(dtype)
    a0 = model.trans.offs.value.astype(dtype)
    Q0 = model.trans.Qs.value.astype(dtype)
    E1 = (A0, a0, psd.symmetrize(Q0))

    ident = (
        jnp.eye(D, dtype=dtype),
        jnp.zeros((D,), dtype),
        jnp.zeros((D, D), dtype),
    )
    E_pows = _all_powers(E1, L, assoc._combine_affine)
    E_L = jax.tree.map(lambda x: x[-1], E_pows)
    if B > 1:
        E_L_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B - 1,) + x.shape), E_L
        )
        S = jax.lax.associative_scan(assoc._combine_affine, E_L_b, axis=0)
        ident_b = jax.tree.map(lambda x: x[None], ident)
        S = jax.tree.map(
            lambda i, s: jnp.concatenate([i, s], axis=0), ident_b, S
        )
    else:
        S = jax.tree.map(lambda x: x[None], ident)
    prior = (
        jnp.zeros((D, D), dtype),
        x0.mean.astype(dtype),
        psd.symmetrize(x0.cov).astype(dtype),
    )
    prior_b = jax.tree.map(lambda x: x[None], prior)
    St = assoc._combine_affine(prior_b, S)          # (B, ...)
    St_e = jax.tree.map(lambda x: x[:, None], St)
    Ep_e = jax.tree.map(lambda x: x[None], E_pows)
    X = assoc._combine_affine(St_e, Ep_e)           # (B, L, ...)
    mean = X[1].reshape((N, D))
    cov = X[2].reshape((N, D, D))
    if not model.trans.forward:
        mean, cov = jnp.flip(mean, 0), jnp.flip(cov, 0)
    return Gaussian(mean, cov)


def marginals_diag(model):
    """(means, vars) of the observation-space marginals for Fill models."""
    xs = latent_marginals(model)
    e_single = _single(model.emis)
    if isinstance(model.emis, em.ScalarEmissions):
        H, h, s = e_single.H, e_single.h, e_single.s
        mu = jnp.einsum("i,ni->n", H, xs.mean) + h
        var = jnp.einsum("i,nij,j->n", H, psd.symmetrize(xs.cov), H) + s
        return mu, var
    H_eff, h_eff, R_kind, R_payload = _effective_emission(e_single)
    mu = jnp.einsum("ij,nj->ni", H_eff, xs.mean) + h_eff
    var = jnp.einsum(
        "ij,njk,ik->ni", H_eff, psd.symmetrize(xs.cov), H_eff
    )
    if R_kind == "diag":
        var = var + R_payload
    else:
        var = var + jnp.diagonal(R_payload)
    return mu, var
