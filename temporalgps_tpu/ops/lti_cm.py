"""Component-major (lane-dense) lti pipeline for moderate state dims.

The row-layout lti engine (ops/lti.py) is HBM-bandwidth-bound at
4 < D <= 48 and pays the (8, 128) tile-padding tax on every (N, D, D)
pass (~8.5x dense bytes at D=19 — see ops/cm.py module docstring). This
module re-implements the scalar-emission lti logpdf with every O(N)
tensor in component-major layout (D, D, N) / (D, N):

  * the covariance outer combine (block-start elements x element powers)
    runs as cm VPU contractions over a dense (B, L) trailing batch,
    computing ONLY the C component (the other five element components are
    dead for the covariance pass);
  * the constant-sided algebra (P_pred sandwich, gain projections) runs as
    single fat MXU matmuls ((D, D) @ (D, D*N) reshapes);
  * the filtering-mean affine recursion m_t = G_t m_{t-1} + w_t runs as a
    blocked Kogge-Stone over (G, w) pair aggregates in cm layout — a few
    fat VPU levels instead of a dispatch-bound per-step scan.

Numerics are identical in exact arithmetic to ops/lti.py (same jittered
Cholesky-congruence inverse, same hi_mode chain casting); engine
equivalence is tested against the sequential scan (tests/test_lti_cm.py).

Scope: scalar emissions, Fill (time-invariant) forward models — the c3
benchmark family (Sum kernels with deterministic blocks at D ~ 19) and any
moderate-D single-output model. Vector emissions fall back to ops/lti.py.

Reference semantics: src/models/lgssm.jl:147-165 (logpdf); the layout is a
TPU re-design with no reference analogue.
"""

import math

import jax
import jax.numpy as jnp

from ..utils import psd
from . import cm, lti

_COV_CHUNK_BYTES = 1 << 29  # ~512MB, cf. ops/lti._COV_CHUNK_BYTES


def _minv_jitter(C_cm):
    """The assoc._minv jitter, cm layout: dtype-scaled, and magnitude-scaled
    in f32 (C_cm (D, D, *batch); returns (*batch,)-shaped eps)."""
    eps = jnp.asarray(
        psd.dtype_jitter(C_cm.dtype, f64_eps=1e-10, f32_eps=3e-6),
        C_cm.dtype,
    ) * jnp.ones(C_cm.shape[2:], C_cm.dtype)
    if jnp.finfo(C_cm.dtype).bits <= 32:
        D = C_cm.shape[0]
        diag = jnp.stack([C_cm[i, i] for i in range(D)], axis=0)
        eps = eps * jnp.maximum(
            jnp.max(jnp.abs(diag), axis=0), jnp.asarray(1.0, C_cm.dtype)
        )
    return eps


def _cov_outer_C(St, E_pows, dtype):
    """C component of combine(St[b], E_pows[l]) for every (b, l) pair.

    St: row-layout 5-tuple, leading dim B (prior-composed block starts).
    E_pows: row-layout 5-tuple, leading dim L (element powers E^1..E^L).
    Returns P_f (D, D, B, L) in cm layout (same math as
    assoc._combine_filter's C output through _minv, restricted to the one
    live component).
    """
    A_j = cm.mat_to_cm(E_pows[0]).astype(dtype)   # (D, D, L)
    C_j = cm.mat_to_cm(E_pows[2]).astype(dtype)
    J_j = cm.mat_to_cm(E_pows[4]).astype(dtype)
    C_i = cm.mat_to_cm(St[2]).astype(dtype)       # (D, D, B)
    D = C_i.shape[0]
    B = C_i.shape[2]
    L = A_j.shape[2]

    I_b = cm.eye(D, dtype, 1)                      # (D, D, 1)
    eps = _minv_jitter(C_i)                        # (B,)
    Lc = cm.chol(C_i + eps[None, None] * I_b)      # (D, D, B)
    Lc_inv = cm.tri_solve(Lc, jnp.broadcast_to(I_b, (D, D, B)))

    # expand to the (B, L) outer batch; heavy terms are all dense-lane
    Lc_e = Lc[..., None]                           # (D, D, B, 1)
    Lci_e = Lc_inv[..., None]
    Jl = J_j[:, :, None, :]                        # (D, D, 1, L)
    Al = A_j[:, :, None, :]
    Cl = C_j[:, :, None, :]
    Ci_e = C_i[..., None]

    S = cm.sym(cm.mm(cm.T(Lc_e), cm.mm(Jl, Lc_e))) + cm.eye(D, dtype, 2)
    Ls = cm.chol(S)                                # (D, D, B, L)
    M = cm.mm(Lc_e, cm.chol_solve(Ls, Lci_e))      # (I + C_i J_j)^{-1}
    AjM = cm.mm(Al, M)
    C = cm.sym(cm.mm(cm.mm(AjM, Ci_e), cm.T(Al))) + Cl
    return C                                       # (D, D, B, L)


def _cov_pass_cm(model, N, B, dtype, hi_mode=None):
    """cm counterpart of lti._cov_pass: P_f (D, D, N) plus the chain
    byproducts. The outer combine is chunked over B to bound the ~5
    (D, D, C, L) temporaries."""
    St, E_pows, e0, trans0, e_single = lti._cov_chain(model, N, B, dtype,
                                                      hi_mode)
    D = model.latent_dim
    L = N // B
    out_dtype = dtype if hi_mode != "full" else St[0].dtype

    elem_bytes = 5 * L * D * D * jnp.dtype(out_dtype).itemsize
    C = B
    while C > 1 and C * elem_bytes > _COV_CHUNK_BYTES:
        C //= 2
    while B % C:
        C -= 1

    def chunk(st_chunk):
        return _cov_outer_C(st_chunk, E_pows, out_dtype)  # (D, D, C, L)

    if C == B:
        P_f = chunk(St)
    else:
        St_c = jax.tree.map(
            lambda x: x.reshape((B // C, C) + x.shape[1:]), St
        )
        stacked = jax.lax.map(chunk, St_c)        # (B//C, D, D, C, L)
        P_f = jnp.moveaxis(stacked, 0, 2)          # (D, D, B//C, C, L)
    P_f = P_f.reshape((D, D, N)).astype(dtype)
    return P_f, e0, trans0, e_single


# ---------------------------------------------------------------------------
# Affine prefix (filtering means) in cm layout
# ---------------------------------------------------------------------------


def _ks_pairs(G, w):
    """Inclusive Kogge-Stone prefix of affine pairs along the LAST axis.

    G (D, D, ..., M), w (D, ..., M); combine of (G1, w1) then (G2, w2) is
    (G2 G1, G2 w1 + w2). Each level is one fat cm contraction — no
    per-step scan dispatch."""
    M = G.shape[-1]
    shift = 1
    while shift < M:
        Gs = G[..., :-shift]
        ws = w[..., :-shift]
        Gh = G[..., shift:]
        # pad-left identity segment stays untouched
        G_new = jnp.concatenate([G[..., :shift], cm.mm(Gh, Gs)], axis=-1)
        w_new = jnp.concatenate(
            [w[..., :shift], cm.mv(Gh, ws) + w[..., shift:]], axis=-1
        )
        G, w = G_new, w_new
        shift *= 2
    return G, w


def affine_prefix_cm(G, w, m0, *, block_len=16):
    """States m_t = G_t m_{t-1} + w_t, t = 1..N (inclusive), cm layout:
    G (D, D, N), w (D, N), m0 (D,). Returns (D, N).

    Blocked Kogge-Stone: within-block prefixes over L2 = block_len (a few
    fat VPU levels over the full (B2, L2) batch), block-start recursion as
    a Kogge-Stone over B2 (cheap: (D, D, B2) work), then one fused
    expansion. Total ~log2(L2) + 1 fat passes over the data."""
    D, N = w.shape
    L2 = min(block_len, N)
    B2 = -(-N // L2)
    pad = B2 * L2 - N
    if pad:
        I_pad = jnp.broadcast_to(cm.eye(D, G.dtype, 1), (D, D, pad))
        G = jnp.concatenate([G, I_pad], axis=-1)
        w = jnp.concatenate([w, jnp.zeros((D, pad), w.dtype)], axis=-1)
    Gb = G.reshape(D, D, B2, L2)
    wb = w.reshape(D, B2, L2)

    # within-block inclusive prefixes (relative to each block start)
    Gp, wp = _ks_pairs(Gb, wb)                     # (D, D, B2, L2)

    # block-total elements -> block-start states via a cheap (B2,) KS
    G_tot = Gp[..., -1]                             # (D, D, B2)
    w_tot = wp[..., -1]                             # (D, B2)
    Gt, wt = _ks_pairs(G_tot, w_tot)                # prefix over blocks
    # m_start[b] = state before block b: m0 for b=0, else prefix[b-1](m0)
    starts = cm.mv(Gt, m0[:, None]) + wt            # (D, B2): state at end of block b
    m_start = jnp.concatenate([m0[:, None], starts[:, :-1]], axis=-1)

    # expansion: m[b, l] = Gp[b, l] m_start[b] + wp[b, l]
    m = cm.mv(Gp, m_start[:, :, None]) + wp         # (D, B2, L2)
    return m.reshape(D, B2 * L2)[:, :N]


# ---------------------------------------------------------------------------
# Scalar logpdf
# ---------------------------------------------------------------------------


def supported(model) -> bool:
    from ..models import emissions as em

    return lti.supported(model) and isinstance(model.emis, em.ScalarEmissions)


def logpdf(model, y, *, n_blocks=None, block_len=16):
    """lml of a scalar-emission Fill model, component-major layout
    (reference semantics: src/models/lgssm.jl:147-165). Value-equivalent to
    lti.logpdf; ~tile-padding-factor less HBM traffic at moderate D."""
    from . import block as blk

    assert supported(model), "lti_cm: scalar-emission Fill forward models only"
    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    N = len(model)
    B = min(n_blocks or blk._default_blocks(N, 1), N)
    while N % B:
        B //= 2
    y = jnp.asarray(y, dtype)

    P_f, e0, (A0, a0, Q0), e_single = jax.checkpoint(
        lambda m: _cov_pass_cm(m, N, B, dtype)
    )(model)

    P_prev = jnp.concatenate(
        [cm.mat_to_cm(psd.symmetrize(x0.cov).astype(dtype))[..., None],
         P_f[..., :-1]],
        axis=-1,
    )
    P_pred = cm.sym(cm.sandwich_const(A0, P_prev) + cm.mat_to_cm(Q0)[..., None])

    H, h, s = e_single.H, e_single.h, e_single.s   # (D,), (), ()
    PH = cm.mv(P_pred, H[:, None])                  # (D, N)
    Sv = cm.vdot(H[:, None], PH) + s                # (N,)
    K = PH / Sv[None]                               # (D, N)
    HA0 = H @ A0                                    # (D,)
    G = A0[:, :, None] - K[:, None, :] * HA0[None, :, None]
    w = a0[:, None] - K * (H @ a0) + K * (y - h)[None, :]  # (D, N)

    means = affine_prefix_cm(G, w, x0.mean.astype(dtype), block_len=block_len)
    m_prev = jnp.concatenate(
        [x0.mean.astype(dtype)[:, None], means[:, :-1]], axis=-1
    )
    m_pred = A0 @ m_prev + a0[:, None]              # one fat (D,D)@(D,N)

    r = y - (cm.vdot(H[:, None], m_pred) + h)
    return -0.5 * jnp.sum(
        jnp.log(Sv) + r * r / Sv + math.log(2.0 * math.pi)
    )
