"""Basis-marginalised inference: deterministic kernel components as
Gaussian-weighted basis functions, marginalised in innovations form.

Deterministic SDE blocks (Cosine / Constant / ApproxPeriodic — Q = 0,
reference: src/gp/lti_sde.jl:239-320) are exactly finite-dimensional
regressors: f_det(t) = M(t) w with w ~ N(0, P0) and M(t) closed-form
(gp/kernels.det_basis_columns). Instead of filtering the full state (where
the deterministic blocks accumulate information without bound, break the
steady/Fisher fast paths, and need an f32 process-noise floor), write

    y ~ N(mu + M w, V),   V = K_stoch + diag(s),   w ~ N(0, P0)

and marginalise w by Woodbury. With the innovations factorisation
V = L S L' produced by the Kalman filter of the REDUCED stochastic model
(e = L^{-1} c are the innovations of a column c, S the innovation
variances), every Woodbury ingredient is a Gram matrix of innovations:

    C[i, j] = c_i' V^{-1} c_j = sum_t e_i,t e_j,t / S_t ,

computed for all columns [y - mu | M] in ONE filter pass: the Kalman gain
and covariance recursion are data-independent, so the mean recursion simply
carries R columns instead of one. Then with T = L0' C_b L0 (L0 = chol(P0),
C_b the basis block, b the basis-vs-y column, u = L0' b):

    lml = -1/2 [ C_yy - u'(I+T)^{-1}u + logdet V + logdet(I+T) + N log 2pi ]

(logdet(P0^{-1} + C_b) + logdet P0 = logdet(I + T); all RxR, R ~ 15).
Everything is well-conditioned: no Q^{-1}, no deterministic covariance
collapse — the exact lml of the full model, usually to better accuracy than
filtering the full state (the f32 full-state path needs a 1e-5 P_inf
process-noise floor; this path needs none).

Engines: `sequential` (ground truth) and `block` (the ops/block two-level
scheme generalised to matrix-valued offsets b, eta — the combine algebra of
assoc._combine_filter with (D, R) right-hand sides).

The reference has no analogue: it filters deterministic blocks in f64 and
differentiates with Mooncake AD (reference: src/gp/lti_sde.jl:255-320,
NEWS.md:9-17).
"""

import jax
import jax.numpy as jnp

from ..models import emissions as em
from ..utils import psd
from ..utils.fill import Fill, is_fill, scan_emit, time_length
from ..utils.gaussian import Gaussian
from . import assoc, block


def _mT(X):
    return jnp.swapaxes(X, -1, -2)


# ---------------------------------------------------------------------------
# sequential engine (ground truth)
# ---------------------------------------------------------------------------

def grams_sequential(model, Y, w_off, *, final_state=False):
    """(logdetV, C) with C[i,j] = c_i' V^{-1} c_j over the columns of Y.

    Y: (N, R) observation columns. w_off: (R,) offset mask — 1 for columns
    that see the model's affine offsets (the data column), 0 for pure-linear
    columns (basis functions). Scalar-emission forward models only.

    final_state=True additionally returns the final per-column filtering
    means (D, R) and the shared covariance (D, D) — the grams_steady head
    uses these on TPU, where this recursion is the numerically-healthy f64
    form: the covariance chain starts at the O(1) prior and every product
    is O(1) x O(1), unlike the block engine's phase-1 element algebra whose
    tiny C legs (~Q magnitudes) underflow the error limb of XLA:TPU's
    float32-pair f64 emulation (probes/f64_scale_sweep.py).
    """
    t = model.trans
    assert t.forward and isinstance(model.emis, em.ScalarEmissions)
    D = model.latent_dim
    dtype = t.x0.dtype
    R = Y.shape[-1]
    Y = jnp.asarray(Y, dtype)
    w_off = jnp.asarray(w_off, dtype)
    I = jnp.eye(D, dtype=dtype)

    def step(carry, sl):
        m, P, gram, ld = carry
        ((A, a, Q), e), yt = sl
        H, h, s = e.H, e.h, e.s
        m = A @ m + a[:, None] * w_off
        P = psd.symmetrize(A @ P @ A.T + Q)
        PH = P @ H
        S = H @ PH + s
        e_t = yt - (H @ m + h * w_off)  # (R,)
        gram = gram + e_t[:, None] * e_t[None, :] / S
        ld = ld + jnp.log(S)
        K = PH / S
        m = m + K[:, None] * e_t[None, :]
        P = psd.symmetrize((I - K[:, None] * H[None, :]) @ P)
        return None, (m, P, gram, ld)

    params = ((t.As, t.offs, t.Qs), model.emis)
    init = (
        t.x0.mean[:, None] * w_off,
        psd.symmetrize(t.x0.cov),
        jnp.zeros((R, R), dtype),
        jnp.zeros((), dtype),
    )
    _, (m_f, P_f, gram, ld) = scan_emit(step, (params, Y), init)
    if final_state:
        return ld, gram, m_f, P_f
    return ld, gram


# ---------------------------------------------------------------------------
# block engine: ops/block phases with matrix-valued (D, R) offsets
# ---------------------------------------------------------------------------

def _step_element_multi(params, w_off, D, dtype):
    """Multi-column filtering element of one step (scalar emissions).
    Identical algebra to block._step_element with b, eta of shape
    (..., D, R)."""
    ((A, a, Q), e), yt = params
    I = jnp.eye(D, dtype=dtype)
    H, h, s = e.H, e.h, e.s
    S = jnp.einsum("...i,...ij,...j->...", H, Q, H) + s
    K = jnp.einsum("...ij,...j->...i", Q, H) / S[..., None]
    ImKH = I - K[..., :, None] * H[..., None, :]
    A_e = ImKH @ A
    off = (jnp.einsum("...i,...i->...", H, a) + h)[..., None] * w_off
    resid = yt - off  # (..., R)
    b_e = a[..., :, None] * w_off + K[..., :, None] * resid[..., None, :]
    C_e = psd.symmetrize(ImKH @ Q)
    w = jnp.einsum("...ji,...j->...i", A, H)
    eta_e = w[..., :, None] * (resid / S[..., None])[..., None, :]
    J_e = psd.symmetrize(w[..., :, None] * w[..., None, :] / S[..., None, None])
    return (A_e, b_e, C_e, eta_e, J_e)


def _combine_filter_multi(e_i, e_j):
    """assoc._combine_filter with matrix-valued b, eta ((..., D, R))."""
    A_i, b_i, C_i, eta_i, J_i = e_i
    A_j, b_j, C_j, eta_j, J_j = e_j
    M = assoc._minv(C_i, J_j)
    AjM = A_j @ M
    MAi = M @ A_i
    A = A_j @ MAi
    b = AjM @ (b_i + C_i @ eta_j) + b_j
    C = psd.symmetrize(AjM @ C_i @ _mT(A_j) + C_j)
    eta = _mT(MAi) @ (eta_j - J_j @ b_i) + eta_i
    J = psd.symmetrize(_mT(MAi) @ J_j @ A_i + J_i)
    return (A, b, C, eta, J)


def _identity_element_multi(B, D, R, dtype):
    return (
        jnp.broadcast_to(jnp.eye(D, dtype=dtype), (B, D, D)),
        jnp.zeros((B, D, R), dtype),
        jnp.zeros((B, D, D), dtype),
        jnp.zeros((B, D, R), dtype),
        jnp.zeros((B, D, D), dtype),
    )


def grams_block(model, Y, w_off, *, n_blocks=None, final_state=False):
    """Block-parallel multi-column innovation grams (see grams_sequential).

    Phase 1 combines multi-column elements within blocks; phase 2
    prefix-combines the aggregates for exact block-start states; phase 3
    runs the batched Kalman recursion inside all blocks at once,
    accumulating per-block grams and innovation log-variances. A remainder
    tail is absorbed by large-variance padding (block._pad_tail): padded
    steps have H = 0, so their innovation is exactly 0 (zero gram
    contribution) and their log-variance exactly log(LARGE_VAR), subtracted
    in closed form.

    final_state=True additionally returns the per-column filtering means
    (D, R) and shared covariance (D, D) after the last step — only valid
    when n_blocks divides N exactly (padded steps would advance the state
    past step N through the transition).
    """
    from ..config import LARGE_VAR

    t = model.trans
    assert t.forward and isinstance(model.emis, em.ScalarEmissions)
    D = model.latent_dim
    dtype = t.x0.dtype
    R = Y.shape[-1]
    Y = jnp.asarray(Y, dtype)
    w_off = jnp.asarray(w_off, dtype)
    N = len(model)
    B = min(n_blocks or block._default_blocks(N, D), N)

    if final_state and N % B:
        raise ValueError(
            f"grams_block(final_state=True) needs n_blocks | N, got {B} and {N}"
        )
    params_p, Y_p, _, n_pad, _ = block._pad_tail(model, Y, B)
    L = (N + n_pad) // B
    blocked = block._split_tree((params_p, Y_p), B, L)

    def phase1_step(carry, sl):
        elem = _step_element_multi(sl, w_off, D, dtype)
        return None, _combine_filter_multi(carry, elem)

    # Multi-column steps hold ~10-20 (L, B, D, R)/(L, B, R, R) residuals in
    # reverse mode, each paying the 14-41x T(8,128) trailing-tile padding
    # tax at small D, R; remat keeps only the scan carries.
    if D > 8 or R > 1:
        phase1_step = jax.checkpoint(phase1_step)
    _, agg = scan_emit(phase1_step, blocked, _identity_element_multi(B, D, R, dtype))

    prior = (
        jnp.zeros((1, D, D), dtype),
        (t.x0.mean[:, None] * w_off)[None].astype(dtype),
        psd.symmetrize(t.x0.cov)[None].astype(dtype),
        jnp.zeros((1, D, R), dtype),
        jnp.zeros((1, D, D), dtype),
    )
    elems = tuple(jnp.concatenate([p, a], axis=0) for p, a in zip(prior, agg))
    pref = jax.lax.associative_scan(_combine_filter_multi, elems, axis=0)
    starts_m, starts_P = pref[1][:-1], pref[2][:-1]  # (B, D, R), (B, D, D)

    I = jnp.eye(D, dtype=dtype)

    def phase3_step(carry, sl):
        m, P, gram, ld = carry  # (B,D,R), (B,D,D), (B,R,R), (B,)
        ((A, a, Q), e), yt = sl
        H, h, s = e.H, e.h, e.s
        m = A @ m + a[..., :, None] * w_off
        P = psd.symmetrize(A @ P @ _mT(A) + Q)
        PH = jnp.einsum("...ij,...j->...i", P, H)
        S = jnp.einsum("...i,...i->...", H, PH) + s
        e_t = yt - (
            jnp.einsum("...i,...ir->...r", H, m) + h[..., None] * w_off
        )
        gram = gram + e_t[..., :, None] * e_t[..., None, :] / S[..., None, None]
        ld = ld + jnp.log(S)
        K = PH / S[..., None]
        m = m + K[..., :, None] * e_t[..., None, :]
        P = psd.symmetrize((I - K[..., :, None] * H[..., None, :]) @ P)
        return None, (m, P, gram, ld)

    if D > 8 or R > 1:
        phase3_step = jax.checkpoint(phase3_step)
    init = (
        starts_m,
        starts_P,
        jnp.zeros((B, R, R), dtype),
        jnp.zeros((B,), dtype),
    )
    _, (m_f, P_f, gram_b, ld_b) = scan_emit(phase3_step, blocked, init)
    gram = jnp.sum(gram_b, axis=0)
    ld = jnp.sum(ld_b) - n_pad * jnp.log(jnp.asarray(LARGE_VAR, dtype))
    if final_state:
        return ld, gram, m_f[-1], P_f[-1]
    return ld, gram


# ---------------------------------------------------------------------------
# steady engine: exact warmup + constant-gain late segment on dense MXU tiles
# ---------------------------------------------------------------------------

def _astype_tree(tree, dt):
    """Cast every floating leaf of a model pytree (Fill-aware) to dtype."""
    import jax

    def cast(l):
        if is_fill(l):
            return Fill(jnp.asarray(l.value, dt), l.N)
        a = jnp.asarray(l)
        return a.astype(dt) if jnp.issubdtype(a.dtype, jnp.floating) else l

    return jax.tree_util.tree_map(cast, tree, is_leaf=is_fill)


def grams_steady(model, Y, w_off, *, n_warmup=None, block_len=16,
                 n_blocks=None, head_dtype=None, fwd_mode=False):
    """Steady-state multi-column innovation grams (see grams_sequential).

    For an all-Fill reduced model the Kalman gain sequence is
    data-independent and converges (ops/steady.py); beyond an exact
    `n_warmup`-step head the filtered mean of EVERY column follows the same
    constant-matrix recursion m_t = G m_{t-1} + w_off c_w + K y_t, solved
    per column by steady.affine_const_states — dense (B, L*D) MXU matmuls
    plus a log-depth Kogge-Stone, no (N, D, D) batched small-matrix ops and
    a custom VJP that re-enters the forward kernel (reverse-mode gradients
    stay cheap and accurate). The gram of the late innovations is then ONE
    (R, M) x (M, R) matmul against the constant innovation variance S.

    The warmup grams run entirely in f64 when x64 is live (a bias in the
    head state propagates into every late innovation); the O(1) constant
    operators come from steady._steady_ops (already hi-precision).
    Approximation contract = ops/steady.py: choose
    n_warmup >~ 5 / (lambda dt); steady.suggest_warmup gives a host-side
    recommendation. Requires fully-observed data and an all-Fill model.

    head_dtype overrides the warmup-head precision (default: the hi dtype,
    f64 under x64). The f64-emulated head is the dominant TPU cost of this
    engine (~6.5x over f32, probes/grams_steady_dissect.py), but the f32
    head SACRIFICES GRADIENT ACCURACY: measured vs the f64 sequential
    oracle (probes/head_dtype_check.py, c3 kernel), f32-head reverse-mode
    grads are 3.2e-3 - 2.4e-2 rel (vs 9e-6 - 2.5e-5 for the f64 head) —
    values stay ~1e-5 (head-state error decays geometrically under the
    steady gain, but the head GRAM accumulates k steps of f32 innovation
    round-off, and its reverse pass amplifies it). Not a safe opt-in for
    gradient-based training; the bench keeps the f64 head.
    """
    from . import steady as sd

    t = model.trans
    assert t.forward and isinstance(model.emis, em.ScalarEmissions)
    sd._check(model)
    N = len(model)
    dtype = t.x0.dtype
    Y = jnp.asarray(Y, dtype)
    w_off = jnp.asarray(w_off, dtype)
    k = sd._round_warmup(n_warmup or sd.DEFAULT_WARMUP, N, base=64)
    if k >= N:
        return grams_block(model, Y, w_off, n_blocks=n_blocks)
    # Fat warmup blocks: L = k/B_w scan iterations dominate the f64-emulated
    # head cost (dispatch + thin batches), so pin L ~ 64 rather than B_w = 64
    # (measured on v5e at k=13376: 618 ms -> 394 ms, grams_steady_dissect).
    B_w = max(64, k // 64)
    while k % B_w:
        B_w //= 2

    hi = sd._hi(dtype) if head_dtype is None else jnp.dtype(head_dtype)
    if head_dtype is not None and not jax.config.jax_enable_x64 and (
        hi == jnp.float64
    ):
        raise ValueError(
            "head_dtype=float64 requested but jax_enable_x64 is off — the "
            "head would silently downcast to float32"
        )
    # On TPU the f64 head MUST be the sequential recursion: the block
    # engine's phase-1/2 element algebra manipulates tiny C legs (~Q
    # magnitudes, dt^k scales) multiplicatively, and the error limb of
    # XLA:TPU's float32-pair f64 emulation underflows there — measured
    # garbage values AND grads at the c3 shapes while CPU is exact
    # (probes/f64_scale_sweep.py, probes/c3_key_bisect.py, round 5). The
    # sequential covariance chain starts at the O(1) prior, so every
    # product is O(1) x O(1) and the emulation holds to ~2^-48.
    if jax.default_backend() == "tpu" and hi == jnp.float64:
        ld_w, gram_w, m_ks, P_k = grams_sequential(
            _astype_tree(sd._trim(model, k), hi),
            Y[:k].astype(hi),
            w_off.astype(hi),
            final_state=True,
        )
        m_k = m_ks
    else:
        ld_w, gram_w, m_k, P_k = grams_block(
            _astype_tree(sd._trim(model, k), hi),
            Y[:k].astype(hi),
            w_off.astype(hi),
            n_blocks=B_w,
            final_state=True,
        )

    # Seed the constants with the head's final covariance: 3 Newton
    # polish steps reach f64 round-off (steady._refine_P_ss), skipping
    # the element-squaring chain (its compile bomb, latency floor, and
    # TPU-emulation underflow).
    ops = sd._steady_ops(model, dtype, N, n_warmup=k, P_seed=P_k)
    y_late = Y[k:]  # (M, R)
    Mlen = N - k
    R = Y.shape[-1]
    D = model.latent_dim
    G, K, c_w = ops["G"], ops["K"], ops["c_w"]
    A0, a0, H, h, S = ops["A0"], ops["a0"], ops["H"], ops["h"], ops["S"]

    # filtered means per column: m_t = G m_{t-1} + w_off c_w + K y_t, all R
    # columns as ONE flat (R*D)-state recursion with kron(I_R, G) — see
    # steady.affine_const_states_multi. Everything N-sized stays in flat
    # (M, R) / (M, R*D) layouts: trailing (D, R) tiles pad ~14-41x under
    # TPU T(8,128) tiling (measured: a 165 GB reverse-mode HBM blowup).
    I_R = jnp.eye(R, dtype=dtype)
    GF = jnp.kron(I_R, G)  # (R*D, R*D) block-diagonal
    # W_flat[m, r*D+d] = c_w[d] w_off[r] + K[d] y[m, r]
    WF = y_late @ jnp.kron(I_R, K[:, None]).T + (
        w_off[:, None] * c_w[None, :]
    ).reshape(-1)[None, :]  # (M, R*D)
    m0 = m_k.astype(dtype)  # (D, R)
    meansF = sd.affine_const_states(
        GF, WF, m0.T.reshape(-1), block_len=block_len,
        custom_vjp=not fwd_mode,
    )  # (M, R*D)

    # innovations e_t = y_t - (H (A0 m_{t-1} + a0 w_off) + h w_off)
    g = A0.T @ H  # (D,)
    c0 = H @ a0 + h
    Zg = jnp.kron(I_R, g[:, None])  # (R*D, R): flat means -> per-column g'm
    proj_prev = jnp.concatenate(
        [(g @ m0)[None, :], meansF[:-1] @ Zg], axis=0
    )  # (M, R)
    E = y_late - proj_prev - c0 * w_off[None, :]
    gram = gram_w.astype(dtype) + (E.T @ E) / S
    ld = ld_w.astype(dtype) + Mlen * ops["logdetS"]
    return ld, gram


# ---------------------------------------------------------------------------
# Woodbury assembly
# ---------------------------------------------------------------------------

def marginalised_lml(ld, gram, P0, N, dtype):
    """lml of y under V + M P0 M' from the innovation grams of [y | M].

    gram[0, 0] = y'V^{-1}y, gram[1:, 0] = M'V^{-1}y, gram[1:, 1:] =
    M'V^{-1}M; ld = logdet V. Cholesky-congruence form keeps every solve
    SPD: T = L0' C_b L0 with L0 = chol(P0)."""
    import math

    q_y = gram[0, 0]
    b = gram[1:, 0]
    C_b = psd.symmetrize(gram[1:, 1:])
    d = C_b.shape[-1]
    if d == 0:
        return -0.5 * (q_y + ld + N * math.log(2.0 * math.pi))
    L0 = psd.cholesky(psd.symmetrize(jnp.asarray(P0, dtype)))
    T = psd.symmetrize(_mT(L0) @ C_b @ L0)
    u = _mT(L0) @ b[:, None]
    IT = T + jnp.eye(d, dtype=dtype)
    Lt = psd.cholesky(IT)
    z = psd.tri_solve(Lt, u)
    corr = jnp.sum(z * z)
    logdet_IT = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lt)))
    return -0.5 * (
        q_y - corr + ld + logdet_IT + N * math.log(2.0 * math.pi)
    )


def logpdf_basis(model, Y, w_off, P0, *, engine="block", n_blocks=None,
                 n_warmup=None, block_len=16, head_dtype=None,
                 fwd_mode=False):
    """Marginalised lml: `model` is the reduced stochastic LGSSM, Y the
    (N, 1 + d_det) column stack [y - 0 | M] (column 0 = data), w_off the
    offset mask, P0 the (d_det, d_det) basis-weight prior covariance.

    engine: "sequential" (ground truth), "block" (exact, parallel), or
    "steady" (constant-gain late segment, ops/steady.py approximation
    contract — requires an all-Fill model and fully-observed data).

    fwd_mode=True bypasses the custom reverse rules so FORWARD-mode AD
    can flow through. On the TPU backend this is THE supported gradient
    path for this engine: reverse-mode through the f64-emulated warmup
    head / steady-constants scans computes structurally wrong cotangents
    on v5e (up to 6 orders off at the c3 model's near-identity-A / tiny-Q
    element scales, probes/c3_key_bisect.py + probes/f64_rev_micro.py —
    every micro op and the whole graph on CPU are exact; the same graphs'
    forward values on TPU are exact). Reverse mode remains fully
    supported on CPU."""
    from ..config import precision_ctx

    dtype = model.trans.x0.dtype
    # Same per-model-dim matmul-precision scoping as the models/lgssm
    # drivers: TPU bf16-default matmuls corrupt the D>4 element recursions.
    with precision_ctx(model.latent_dim):
        if engine == "sequential":
            ld, gram = grams_sequential(model, Y, w_off)
        elif engine == "steady":
            ld, gram = grams_steady(
                model, Y, w_off, n_warmup=n_warmup, block_len=block_len,
                n_blocks=n_blocks, head_dtype=head_dtype, fwd_mode=fwd_mode,
            )
        else:
            ld, gram = grams_block(model, Y, w_off, n_blocks=n_blocks)
        return marginalised_lml(ld, gram, P0, len(model), dtype)
