"""Steady-state time-invariant Kalman engine.

For all-Fill forward models (the RegularSpacing / spatio-temporal-grid / DTC
family, reference: src/gp/lti_sde.jl:148-160) the Kalman covariance
recursion is a time-invariant Riccati iteration that converges geometrically
to its fixed point (rate = closed-loop spectral radius squared,
~|1 - lambda dt|^2 per step for Matern models). This engine:

  1. runs the EXACT blocked covariance/mean/lml pipeline (ops/lti.py) on the
     first `n_warmup` steps only;
  2. computes the converged filtering covariance by binary-power
     composition of the constant filtering element (~log2(8 x warmup)
     unbatched combines, in f64 — see _hi) and uses it for every later step;
  3. solves the remaining mean recursion m_t = G m_{t-1} + w_t with a
     CONSTANT matrix G via `affine_const_states` — a within-block
     convolution expressed as one dense (B, L*D) x (L*D, L*D) matmul plus a
     log2(B)-level constant-matrix Kogge-Stone, all dense MXU tiles;
  4. evaluates the remaining lml terms with constant per-step operators
     (one Dout-dim Cholesky total, const-sided batched matmuls).

Nothing in the steady segment touches an (N, D, D) batched small-matrix op,
which removes the (8,128)-tile padding tax that bounds the exact lti engine
at moderate D (docs/ROADMAP.md item 2c) and makes reverse-mode gradients
cheap (no O(N) covariance residuals) with cost independent of the number of
hyperparameters.

Approximation contract: per-step filtering covariances for t >= n_warmup
are replaced by the converged value. The induced logpdf error decays like
rho^(2 n_warmup); callers must choose n_warmup >~ 5 / (lambda dt) (default
512 covers lambda dt >~ 0.01). The engine is OPT-IN (engine="steady");
tests validate against the sequential engine at f64. Models with
deterministic diffusion blocks (Cosine/Constant/ApproxPeriodic) converge
too slowly for the default warmup and are rejected. No missing data (the
large-variance fill breaks time-invariance) — same restriction as ops/lti.

The exact recursion's semantics follow reference src/models/lgssm.jl:147-165;
the steady-state shortcut is a TPU-native re-design with no reference
counterpart.
"""

import functools
import math

import jax
import jax.numpy as jnp

from ..models import emissions as em
from ..utils import psd
from ..utils.fill import Fill, is_fill
from . import assoc, lti

DEFAULT_WARMUP = 512


def _round_warmup(k, N, base=16):
    """Round a warmup length UP to a multiple of `base` (capped at N).

    The exact-warmup segment is block-filtered with n_blocks chosen by
    halving until it divides k — an ODD k (e.g. from suggest_warmup's
    spectral bound) collapses that to ONE block, i.e. a k-iteration
    sequential scan (measured: 13339-step f64 scan on TPU inside the c3
    basis/steady logpdf = tens of seconds). Rounding up only grows the
    exactly-filtered head, so the approximation contract is unaffected.
    `base` matches the caller's warmup block width: 16 for the steady /
    sharded-steady filters, 64 for basis.grams_steady."""
    return min(-(-int(k) // base) * base, int(N))


# Override for the warmup covariance-pass precision mode: None picks by
# state dim ("full" f64 for D <= 8, "chain" above — see _filter_steady);
# set to "full" / "chain" / False to force. "full" buys ~4e-5-rel f32
# hyperparameter grads at an N-independent f64 cost that grows with D
# (~385 ms at D=30 on v5e); "chain" is the bounded-cost default at
# moderate D (~3e-3-rel grads).
COV_HI_MODE = None


def _hi(dtype):
    """Precision for the O(1)-sized constant steady-state operators.

    A relative error delta in logdetS / S enters the lml multiplied by N, so
    the constant operators (converged covariance, gain, innovation factors)
    are computed in f64 when x64 is live and cast to the working dtype; the
    O(N) segment math stays in `dtype` (its rounding is incoherent, not a
    bias). Measured: pure-f32 operators bias logpdf by ~3.5e-4 rel at any N
    and corrupt small hyperparameter gradients by 30-50%."""
    return jnp.float64 if jax.config.jax_enable_x64 else dtype


def supported(model) -> bool:
    return lti.supported(model) and not model.trans.det_blocks


def suggest_warmup(model, *, tol=1e-10) -> int:
    """Host-side warmup recommendation for this model.

    The steady approximation error decays like rho^(2k) with rho the
    spectral radius of the constant transition (open-loop bound; the
    closed-loop filter converges at least as fast). Returns the smallest k
    with rho^(2k) <= tol, in [64, len(model)]. Call OUTSIDE jit with
    concrete hyperparameters (eigvals are host-side); pass the result as
    `n_warmup=`. The default warmup (512) covers lambda*dt >= ~0.01."""
    import numpy as np

    A0 = np.asarray(model.trans.As.value, np.float64)
    rho = float(np.max(np.abs(np.linalg.eigvals(A0))))
    if rho >= 1.0:
        raise ValueError(
            f"transition spectral radius {rho} >= 1: not a stable LTI model"
        )
    k = int(np.ceil(np.log(tol) / (2.0 * np.log(rho))))
    return max(64, _round_warmup(k, len(model), base=64))


def _trim(model, k):
    """The same Fill model over its first k steps."""
    return jax.tree_util.tree_map(
        lambda l: Fill(l.value, k) if is_fill(l) else l, model, is_leaf=is_fill
    )


def _mT(X):
    return jnp.swapaxes(X, -1, -2)


def _steady_filter_cov(model, N, dtype, n_warmup=None):
    """Filtering covariance at t = 2^j >= min(N, ~32 x warmup) via
    binary-power self-composition of the constant filtering element
    (data-free, so the b/eta components stay zero).

    The squaring count is capped at log2(8 x warmup): the engine's own
    approximation contract (rho^(2 n_warmup) decay by step n_warmup, with
    n_warmup >= 5/(lambda dt)) puts convergence at t = 8 x warmup below
    e^-80 — far under f64 round-off — and each squaring is a full f64
    element combine (~5 ms at D=30 on v5e under f64 emulation), so going
    to 2^ceil(log2 N) buys nothing.

    The squarings run as ONE lax.scan over levels, not a Python loop: the
    unrolled-psd f64 combine body is a huge HLO under TPU f64 emulation,
    and ~13 inlined copies of it were the engine's remote-compile bomb
    (measured 321 s cold at the bench-c3 shape, docs/ROADMAP.md
    "Dissection"); the scan compiles the body once."""
    D = model.latent_dim
    hi = _hi(dtype)
    # latency_mode: ~12 unbatched f64 combines x ~5 small chol/tri_solve
    # custom calls each was a ~50-100 ms N-independent floor; the unrolled
    # paths fuse the whole chain into one custom-call-free XLA program.
    with psd.latency_mode():
        e0, _, _ = lti._const_element(model, hi)
        E = (e0[0], jnp.zeros((D,), hi), e0[2], jnp.zeros((D,), hi), e0[4])
        t_cap = min(N, 8 * (n_warmup or DEFAULT_WARMUP))
        levels = max(1, math.ceil(math.log2(max(t_cap, 2))))

        def _square(E_c, _):
            return assoc._combine_filter(E_c, E_c), None

        E, _ = jax.lax.scan(_square, E, None, length=levels)
        x0 = model.trans.x0
        prior = (
            jnp.zeros((D, D), hi),
            x0.mean.astype(hi),
            psd.symmetrize(x0.cov).astype(hi),
            jnp.zeros((D,), hi),
            jnp.zeros((D, D), hi),
        )
        return psd.symmetrize(assoc._combine_filter(prior, E)[2])


def affine_const_states(G, w, m0, *, block_len=16, custom_vjp=True):
    """States m_t = G m_{t-1} + w_t, t = 1..M, m_0 = m0, with CONSTANT G.

    w: (M, D). Returns (M, D). TPU-native schedule: G-powers G^0..G^L once
    (tiny L-scan), the within-block inhomogeneous sums as ONE dense
    (B, L*D) @ (L*D, L*D) matmul against a lower-triangular block-Toeplitz
    operator, block-start states via a log2(B)-level Kogge-Stone whose
    per-level op is a const-sided (B, D) @ (D, D) matmul, and the final
    within-block expansion as one (L*D, D) @ (D, B) matmul.

    Reverse mode is a custom VJP: the adjoint of a constant-matrix affine
    recursion is the SAME recursion run with G^T on the flipped cotangents
    (lambda_t = mbar_t + G' lambda_{t+1}), so the backward pass re-enters
    this forward kernel instead of XLA's transposed Kogge-Stone (which
    blew up the TPU compile at M ~ 1e6). The ambient matmul precision is
    captured HERE and re-applied inside the bwd: custom_vjp bwd traces
    outside the caller's precision scope, and the TPU bf16 default
    corrupts the adjoint recursion (config.ambient_matmul_precision).

    custom_vjp=False bypasses the custom reverse rule so FORWARD-mode AD
    (jax.jvp/jacfwd) can flow through — custom_vjp functions reject jvp.
    The transpose-blowup the custom rule guards against only exists in
    reverse mode; plain XLA AD handles the jvp fine."""
    from ..config import ambient_matmul_precision

    if not custom_vjp:
        return _acs_impl(G, w, m0, block_len)
    return _acs(G, w, m0, block_len, ambient_matmul_precision())


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _acs(G, w, m0, block_len, prec=None):
    return _acs_impl(G, w, m0, block_len)


def _acs_impl(G, w, m0, block_len):
    M, D = w.shape
    dtype = w.dtype
    L = min(block_len, M)
    B = -(-M // L)  # ceil
    pad = B * L - M
    if pad:
        w = jnp.concatenate([w, jnp.zeros((pad, D), dtype)], axis=0)
    wb = w.reshape(B, L, D)

    # G^0..G^L  (L+1, D, D)
    def pow_step(P, _):
        Pn = G @ P
        return Pn, Pn

    _, Gp_tail = jax.lax.scan(pow_step, jnp.eye(D, dtype=dtype), None, length=L)
    Gp = jnp.concatenate([jnp.eye(D, dtype=dtype)[None], Gp_tail], axis=0)

    # T[l, i] = G^(l-i) for i <= l else 0; one gather, built once.
    li = jnp.arange(L)
    idx = li[:, None] - li[None, :]  # (L, L)
    Tmat = jnp.where(
        (idx >= 0)[:, :, None, None], Gp[jnp.clip(idx, 0, L)], 0.0
    )  # (L, L, D, D)
    # W[b, l, d1] = sum_{i,d2} T[l, i, d1, d2] w[b, i, d2]
    T2 = Tmat.transpose(0, 2, 1, 3).reshape(L * D, L * D)
    W = (wb.reshape(B, L * D) @ T2.T).reshape(B, L, D)

    # Block-start states: m_start[0] = m0; m_start[b+1] = G^L m_start[b] + W[b, L-1].
    GL = Gp[L]
    h = W[:, L - 1, :]  # (B, D)
    h = h.at[0].add(GL @ m0)
    # decayed inclusive prefix: p[b] = sum_{i<=b} (G^L)^(b-i) h[i]
    P_lev = GL
    p = h
    shift = 1
    while shift < B:
        p = p.at[shift:].add(p[:-shift] @ P_lev.T)
        P_lev = P_lev @ P_lev
        shift *= 2
    m_start = jnp.concatenate([m0[None], p[:-1]], axis=0)  # (B, D)

    # m[b, l] = G^(l+1) m_start[b] + W[b, l]
    lead = (Gp[1:].reshape(L * D, D) @ m_start.T).T.reshape(B, L, D)
    return (lead + W).reshape(B * L, D)[:M]


def _acs_fwd(G, w, m0, block_len, prec=None):
    m = _acs_impl(G, w, m0, block_len)
    return m, (G, w, m0, m)


def _acs_bwd(block_len, prec, res, mbar):
    from ..config import matmul_precision_ctx

    G, w, m0, m = res
    # ambient None means the TPU bf16 default — never right for a REVERSE
    # recursion (bf16 matmuls corrupt gradients, CLAUDE.md); floor at
    # 'highest' (reverse cost is not on the inference fast path).
    with matmul_precision_ctx(prec or "highest"):
        # lambda_t = mbar_t + G' lambda_{t+1}  (lambda_{M+1} = 0)
        lam = jnp.flip(
            _acs_impl(G.T, jnp.flip(mbar, 0), jnp.zeros_like(m0), block_len), 0
        )
        m_prev = jnp.concatenate([m0[None], m[:-1]], axis=0)
        G_bar = lam.T @ m_prev           # sum_t lambda_t m_{t-1}'
        m0_bar = G.T @ lam[0]
    return G_bar, lam, m0_bar


_acs.defvjp(_acs_fwd, _acs_bwd)


def affine_const_states_multi(G, W, m0, *, block_len=16):
    """Matrix-state recursion m_t = G m_{t-1} + W_t on (D, R) states.

    W: (M, D, R), m0: (D, R) -> (M, D, R). Lifted to ONE flat (R*D)-state
    vector recursion with the block-diagonal kron(I_R, G) and solved by
    `affine_const_states`: the R columns ride in the lane dimension of
    every dense matmul. A flat (M, R*D) layout pads ~1.1-1.7x on TPU where
    trailing (D, R) tiles pad ~14-41x (T(8,128) tiling of 5x15 blocks —
    measured as a 165 GB reverse-mode HBM blowup at M=1e6), and the
    vmapped-custom-vjp lowering (measured pathological on TPU: 35 s at
    M=1M, R=15, D=5 vs ~ms for one unbatched call) is avoided entirely.
    Flat index is column-major (column r's state at [r*D:(r+1)*D]); hot
    callers should build the flat operands directly to keep (M, D, R)
    arrays out of the graph entirely (ops/basis.grams_steady does)."""
    M, D, R = W.shape
    GF = jnp.kron(jnp.eye(R, dtype=G.dtype), G)
    WF = jnp.swapaxes(W, 1, 2).reshape(M, R * D)
    m0F = m0.T.reshape(R * D)
    out = affine_const_states(GF, WF, m0F, block_len=block_len)
    return jnp.swapaxes(out.reshape(M, R, D), 1, 2)


def _refine_P_ss(model, P_seed, N, n_warmup, hi):
    """Polish a filtering-covariance seed to the Riccati fixed point by
    defect correction (Kleinman-flavoured Newton; scalar emissions).

    With F the one-step filter-covariance map and G the closed loop at P,
    F(P + D) ~ F(P) + G D G', so the fixed-point correction solves the
    discrete Lyapunov equation D - G D G' = F(P) - P, done by doubling
    (X <- X + G X G', G <- G G) — log-depth, and every quantity stays
    O(1): this is the TPU-safe replacement for backing the constants out
    of the element-squaring chain, whose tiny-Q element algebra underflows
    the error limb of the float32-pair f64 emulation
    (probes/f64_scale_sweep.py). Quadratic convergence: a warmup-head seed
    at rho^(2k) ~ tol reaches f64 round-off in 3 iterations."""
    import math

    A = model.trans.As.value.astype(hi)
    Q = psd.symmetrize(model.trans.Qs.value.astype(hi))
    e = lti._single(model.emis)
    H, s = e.H.astype(hi), e.s.astype(hi)
    t_cap = min(N, 8 * (n_warmup or DEFAULT_WARMUP))
    levels = max(1, math.ceil(math.log2(max(t_cap, 2))))

    def F(P):
        Pp = psd.symmetrize(A @ P @ A.T + Q)
        S = H @ Pp @ H + s
        K = (Pp @ H) / S
        Pf = psd.symmetrize(Pp - K[:, None] * (H @ Pp)[None, :])
        return Pf, K

    def newton(P, _):
        Pn, K = F(P)
        G = A - K[:, None] * (H @ A)[None, :]  # d(filtered)/d(prev) root

        def dbl(carry, __):
            X, Gj = carry
            return (psd.symmetrize(X + Gj @ X @ Gj.T), Gj @ Gj), None

        (X, _), _ = jax.lax.scan(
            dbl, (psd.symmetrize(Pn - P), G), None, length=levels
        )
        return psd.symmetrize(P + X), None

    P, _ = jax.lax.scan(newton, psd.symmetrize(P_seed.astype(hi)), None,
                        length=3)
    return P


def _steady_ops(model, dtype, N, n_warmup=None, P_seed=None):
    """Constant late-segment operators from the converged covariance.

    Everything here is O(1)-sized (D- and Dout-dim), computed in `_hi`
    precision, and cast to the working dtype on the way out — see `_hi`.
    Runs under psd.latency_mode(): unbatched small solves would otherwise
    each pay XLA custom-call latency (probes/f64_combine_micro.py).

    P_seed (scalar emissions only) seeds _refine_P_ss instead of running
    the element-squaring chain. Callers that already ran an exact k-step
    warmup filter pass the head's final covariance: the polish reaches
    f64 round-off in 3 Newton steps, removing the chain's N-independent
    compile + runtime floor (docs/ROADMAP.md item 5) and, on TPU, the
    emulation-underflow garbage the chain produces at tiny-Q element
    scales (probes/f64_scale_sweep.py, round 5)."""
    with psd.latency_mode():
        return _steady_ops_impl(model, dtype, N, n_warmup, P_seed)


def _steady_ops_impl(model, dtype, N, n_warmup=None, P_seed=None):
    hi = _hi(dtype)
    if P_seed is not None and isinstance(model.emis, em.ScalarEmissions):
        P_ss = _refine_P_ss(model, P_seed, N, n_warmup, hi)
    else:
        P_ss = _steady_filter_cov(model, N, dtype, n_warmup)  # already hi
    A0 = model.trans.As.value.astype(hi)
    a0 = model.trans.offs.value.astype(hi)
    Q0 = model.trans.Qs.value.astype(hi)
    P_pred = psd.symmetrize(A0 @ P_ss @ A0.T + Q0)
    e_single = lti._single(model.emis)
    out = dict(A0=A0, a0=a0, P_ss=P_ss, P_pred=P_pred)
    if isinstance(model.emis, em.ScalarEmissions):
        H, h, s = e_single.H.astype(hi), e_single.h.astype(hi), e_single.s.astype(hi)
        PH = P_pred @ H
        S = H @ PH + s
        K = PH / S  # (D,)
        G = A0 - K[:, None] * (H @ A0)[None, :]
        c_w = a0 - K * (H @ a0 + h)
        out.update(scalar=True, H=H, h=h, S=S, K=K, G=G, c_w=c_w,
                   logdetS=jnp.log(S))
    else:
        H_eff, h_eff, R_kind, R_payload = lti._effective_emission(e_single)
        H_eff = H_eff.astype(hi)
        h_eff = h_eff.astype(hi)
        Dout = H_eff.shape[0]
        if R_kind == "diag":
            R = jnp.zeros((Dout, Dout), hi).at[
                jnp.arange(Dout), jnp.arange(Dout)
            ].set(R_payload.astype(hi))
        else:
            R = R_payload.astype(hi)
        S = psd.symmetrize(H_eff @ P_pred @ H_eff.T + R)
        Ls = psd.cholesky(S)
        S_inv = psd.chol_solve(Ls, jnp.eye(Dout, dtype=hi))
        K = P_pred @ (H_eff.T @ S_inv)  # (D, Dout)
        G = A0 - K @ (H_eff @ A0)
        c_w = a0 - K @ (H_eff @ a0 + h_eff)
        out.update(scalar=False, H_eff=H_eff, h_eff=h_eff, S_inv=S_inv,
                   K=K, G=G, c_w=c_w, logdetS=psd.logdet_from_chol(Ls),
                   Dout=Dout)
    cast = {
        k: (v.astype(dtype) if isinstance(v, jnp.ndarray) and
            jnp.issubdtype(v.dtype, jnp.floating) else v)
        for k, v in out.items()
    }
    # hi-precision copies for the smoother's constant-gain algebra (a bias
    # in J_ss drifts the smoothed means across the whole late segment)
    cast["P_ss_hi"] = P_ss
    cast["P_pred_hi"] = P_pred
    cast["A0_hi"] = A0
    return cast


def _check(model):
    if not lti.supported(model):
        raise ValueError(
            "engine='steady' requires a forward model with all-Fill "
            "(time-invariant) transition and emission parameters"
        )
    if model.trans.det_blocks:
        raise ValueError(
            "engine='steady' rejects models with deterministic diffusion "
            "blocks (Cosine/Constant/ApproxPeriodic): their Riccati "
            "recursion converges too slowly for a fixed warmup; use "
            "engine='sequential'"
        )


def _filter_steady(model, y, k, *, n_blocks=None, block_len=16):
    """Hybrid filter shared by logpdf and the steady smoother.

    Returns a dict with the exact warmup `q` (ops/lti._filter_pass on the
    trimmed model), the constant late-segment operators `ops`, the late
    filtering means (`means_late`, (N-k, D)) and late predicted means."""
    dtype = model.trans.x0.dtype
    y = jnp.asarray(y, dtype)
    B_w = 16
    while k % B_w:
        B_w //= 2
    # warmup covariance pass precision: "full" f64 gives ~4e-5 rel f32
    # hyperparameter grads but pays f64 for the O(k) outer combine —
    # cheap at small D, ~100s of ms at D~30 on TPU; "chain" bounds the f64
    # work to the log-depth power chain (flat ~3e-3 rel grads).
    # COV_HI_MODE overrides the by-dim default.
    #
    # On TPU with scalar emissions: NO f64 at all — the f64 element/chain
    # algebra at small-dt scales is emulation-fragile (float32-pair limb
    # underflow, probes/f64_scale_sweep.py; measured ~1e-3 rel lml bias
    # through this warmup at dt=1e-2, probes/tpu_smoke.py g1). The native
    # f32 pass is exact-to-f32, and the constants are recovered to f64
    # round-off by the seeded Newton polish below.
    scalar_em = isinstance(model.emis, em.ScalarEmissions)
    if COV_HI_MODE is not None:
        hi_mode = COV_HI_MODE
    elif scalar_em and jax.default_backend() == "tpu":
        hi_mode = False
    else:
        hi_mode = "full" if model.latent_dim <= 8 else "chain"
    q = lti._filter_pass(_trim(model, k), y[:k], n_blocks=n_blocks or B_w,
                         cov_hi=hi_mode)
    m_start = q["means"][-1]

    # Seed the constants with the warmup's final filtered covariance
    # (scalar emissions): the Newton polish converges from any reasonable
    # PSD seed and replaces the element-squaring chain, whose tiny-element
    # f64 algebra is emulation-fragile on TPU even at dt=1e-2 (measured
    # ~1e-3 rel lml bias through the late-segment constants,
    # probes/tpu_smoke.py g1 round 5). Vector emissions keep the chain
    # (the dense polish would need big-Dout f64 cholesky per step).
    seed = q["P_f"][-1] if scalar_em else None
    ops = _steady_ops(model, dtype, len(model), n_warmup=k, P_seed=seed)
    y_late = y[k:]
    A0, a0 = ops["A0"], ops["a0"]
    if ops["scalar"]:
        # m_filt = G m_prev + (a0 - K(H a0 + h)) + K y : c_w already carries
        # the -K h term, so w adds K*y with NO second h subtraction.
        w = ops["c_w"][None, :] + y_late[:, None] * ops["K"][None, :]
    else:
        w = ops["c_w"][None, :] + y_late @ ops["K"].T
    means_late = affine_const_states(ops["G"], w, m_start, block_len=block_len)
    m_prev_late = jnp.concatenate([m_start[None], means_late[:-1]], axis=0)
    m_pred_late = m_prev_late @ A0.T + a0
    return dict(
        q=q, ops=ops, y=y, y_late=y_late, m_start=m_start,
        means_late=means_late, m_pred_late=m_pred_late, dtype=dtype,
    )


def logpdf(model, y, *, n_warmup=None, n_blocks=None, block_len=16):
    """lml of a Fill-parameter forward model, steady-state approximation
    beyond the first n_warmup (default 512) exactly-filtered steps."""
    _check(model)
    N = len(model)
    k = _round_warmup(n_warmup or DEFAULT_WARMUP, N)
    if k >= N:
        return lti.logpdf(model, y, n_blocks=n_blocks)
    f = _filter_steady(model, y, k, n_blocks=n_blocks,
                       block_len=block_len)
    lp_early = lti._lml_from_filter(f["q"])

    ops, y_late, m_pred = f["ops"], f["y_late"], f["m_pred_late"]
    Mlen = N - k
    if ops["scalar"]:
        r = y_late - (m_pred @ ops["H"] + ops["h"])
        lp_late = -0.5 * (
            Mlen * (ops["logdetS"] + math.log(2.0 * math.pi))
            + jnp.sum(r * r) / ops["S"]
        )
    else:
        r = y_late - (m_pred @ ops["H_eff"].T + ops["h_eff"])
        quad = jnp.sum(r * (r @ ops["S_inv"].T))
        lp_late = -0.5 * (
            Mlen * (ops["logdetS"] + ops["Dout"] * math.log(2.0 * math.pi))
            + quad
        )
    return lp_early + lp_late


def latent_marginals(model, *, n_warmup=None, block_len=16):
    """Prior latent marginals: exact means everywhere (constant-matrix
    affine solve); covariances exact for the first n_warmup steps, converged
    Lyapunov fixed point (= P_inf for stationarity-initialised models)
    beyond."""
    from ..utils.gaussian import Gaussian

    _check(model)
    N = len(model)
    k = _round_warmup(n_warmup or DEFAULT_WARMUP, N)
    dtype = model.trans.x0.dtype
    D = model.latent_dim
    A0 = model.trans.As.value.astype(dtype)
    a0 = model.trans.offs.value.astype(dtype)
    x0 = model.trans.x0

    # means: exact, constant-matrix affine recursion
    w = jnp.broadcast_to(a0, (N, D))
    means = affine_const_states(A0, w, x0.mean.astype(dtype),
                                block_len=block_len)

    # covariances: exact k-step Lyapunov via affine-element powers, then
    # the converged value via binary-power composition. NB this materialises
    # the (N, D, D) chain the caller asked for; marginals_diag has a
    # segment-wise path that avoids it.
    P_early, P_ss = _prior_cov_segments(model, N, k, dtype)
    if P_ss is None:
        covs = P_early
    else:
        covs = jnp.concatenate(
            [P_early, jnp.broadcast_to(P_ss, (N - k, D, D))], axis=0
        )
    if not model.trans.forward:
        means, covs = jnp.flip(means, 0), jnp.flip(covs, 0)
    return Gaussian(means, covs)


def _prior_cov_segments(model, N, k, dtype):
    """(P_early (k', D, D), P_ss (D, D) or None when k' == N): exact k-step
    Lyapunov covariances + the converged fixed point. Shared by
    latent_marginals and marginals_diag; never materialises (N, D, D)."""
    D = model.latent_dim
    A0 = model.trans.As.value.astype(dtype)
    Q0 = psd.symmetrize(model.trans.Qs.value.astype(dtype))
    x0 = model.trans.x0
    E1 = (A0, jnp.zeros((D,), dtype), Q0)
    E_pows = lti._all_powers(E1, k, assoc._combine_affine)
    P0 = psd.symmetrize(x0.cov).astype(dtype)
    At = E_pows[0]  # (k, D, D)
    P_early = psd.symmetrize(At @ P0 @ _mT(At) + E_pows[2])
    if k >= N:
        return P_early[:N], None
    hi = _hi(dtype)
    with psd.latency_mode():
        E = jax.tree_util.tree_map(lambda l: l[-1].astype(hi), E_pows)
        for _ in range(max(1, math.ceil(math.log2(max(N // max(k, 1), 2))))):
            E = assoc._combine_affine(E, E)
        P_ss = psd.symmetrize(E[0] @ P0.astype(hi) @ E[0].T + E[2])
    return P_early, P_ss.astype(dtype)


def marginals_diag(model, *, n_warmup=None):
    """(means, vars) of observation-space marginals, steady-state prior.

    Variances are computed segment-wise (exact warmup einsum + one constant
    projection broadcast) so no (N, D, D) latent covariance tensor is ever
    materialised — at DTC scale (Nt=1e6, D=30) that tensor alone would be
    3.6 GB of HBM."""
    _check(model)
    N = len(model)
    k = _round_warmup(n_warmup or DEFAULT_WARMUP, N)
    dtype = model.trans.x0.dtype
    D = model.latent_dim
    A0 = model.trans.As.value.astype(dtype)
    a0 = model.trans.offs.value.astype(dtype)

    means_lat = affine_const_states(
        A0, jnp.broadcast_to(a0, (N, D)), model.trans.x0.mean.astype(dtype)
    )
    P_early, P_ss = _prior_cov_segments(model, N, k, dtype)

    e_single = lti._single(model.emis)
    if isinstance(model.emis, em.ScalarEmissions):
        H = e_single.H.astype(dtype)
        h, s = e_single.h, e_single.s
        mu = means_lat @ H + h
        v_early = jnp.einsum("i,nij,j->n", H, P_early, H)
        if P_ss is None:
            var = v_early + s
        else:
            v_ss = H @ P_ss @ H
            var = jnp.concatenate(
                [v_early, jnp.broadcast_to(v_ss, (N - k,))]
            ) + s
    else:
        H_eff, h_eff, R_kind, R_payload = lti._effective_emission(e_single)
        H_eff = H_eff.astype(dtype)
        mu = means_lat @ H_eff.T + h_eff
        v_early = jnp.einsum("ij,njk,ik->ni", H_eff, P_early, H_eff)
        if P_ss is None:
            var = v_early
        else:
            v_ss = jnp.einsum("ij,jk,ik->i", H_eff, P_ss, H_eff)
            var = jnp.concatenate(
                [v_early, jnp.broadcast_to(v_ss, (N - k, v_ss.shape[0]))],
                axis=0,
            )
        if R_kind == "diag":
            var = var + R_payload
        else:
            var = var + jnp.diagonal(R_payload)
    if not model.trans.forward:
        mu, var = jnp.flip(mu, 0), jnp.flip(var, 0)
    return mu, var


def rand_with_eps(model, eps_t, eps_e, x_init, *, block_len=16):
    """EXACT joint observation sample of a Fill model from pre-drawn noise
    (same contract as block/assoc rand_with_eps; reference semantics:
    src/models/lgssm.jl:65-91).

    Not an approximation: with noise pre-drawn, the latent chain
    x_t = A x_{t-1} + a + chol(Q) eps_t is a constant-matrix affine
    recursion, solved by `affine_const_states` as dense MXU matmuls; the
    emission map is one batched call. Identical draws to the sequential
    engine for the same key (same chol + jitter conventions)."""
    from ..config import RAND_JITTER

    dtype = x_init.dtype
    A0 = model.trans.As.value.astype(dtype)
    a0 = model.trans.offs.value.astype(dtype)
    Q0 = model.trans.Qs.value.astype(dtype)
    with psd.latency_mode():
        L = psd.cholesky(psd.add_jitter(psd.symmetrize(Q0), RAND_JITTER))
    w = a0 + eps_t @ L.T
    xs = affine_const_states(A0, w, x_init, block_len=block_len)
    e_single = lti._single(model.emis)
    return em.step_conditional_rand(eps_e, xs, e_single)


# ---------------------------------------------------------------------------
# Steady-state RTS smoother (posterior marginals)
# ---------------------------------------------------------------------------


def _smoothed_cov_fixed_point(J_ss, C_mid, N):
    """Fixed point of the backward covariance map X -> J X J' + C via
    binary-power composition of the affine covariance map."""
    with psd.latency_mode():
        Jp, Cp = J_ss, C_mid
        for _ in range(max(1, math.ceil(math.log2(max(N, 2))))):
            Cp = psd.symmetrize(Jp @ Cp @ Jp.T + Cp)
            Jp = Jp @ Jp
    return Cp


def posterior_marginals_diag(model, y, *, emis=None, n_warmup=None,
                             block_len=16, n_blocks=None):
    """Observation-space smoothed marginals (means, vars) of a Fill model —
    the steady counterpart of `marginals_diag(posterior(model, y))`
    (reference semantics: src/models/lgssm.jl:193-240 + :125-141).

    The smoothing covariance converges backwards to its own fixed point:
    exact head (first n_warmup steps, per-step gains), constant middle,
    exact tail (last ~n_warmup steps, constant gain from the filter end).
    `emis` optionally replaces the emission container for prediction at new
    outputs (all-Fill leaves; the DTC approx-posterior path). No missing
    data — same restriction as logpdf."""
    from ..config import POSTERIOR_JITTER

    _check(model)
    N = len(model)
    k = _round_warmup(n_warmup or DEFAULT_WARMUP, N)
    emis_use = emis if emis is not None else model.emis
    if N <= max(2 * k, 64):
        # small-N: exact materialised smoother
        from ..models import lgssm as lg
        from ..models.lgssm import LGSSM

        hi_mode = COV_HI_MODE or ("full" if model.latent_dim <= 8
                                  else "chain")
        post = lti.posterior(model, y, n_blocks=n_blocks,
                             cov_hi=hi_mode)
        return lg.marginals_diag(LGSSM(post.trans, emis_use))

    f = _filter_steady(model, y, k, n_blocks=n_blocks,
                       block_len=block_len)
    q, ops = f["q"], f["ops"]
    dtype = f["dtype"]
    A0 = ops["A0"]
    D = model.latent_dim
    P_ss_f, P_pred_ss = ops["P_ss"], ops["P_pred"]
    kt = min(k, N - k)  # tail length; middle = N - k - kt >= 0

    # smoother gains: exact head J_t = P_f[t] A' P_pred[t+1]^{-1} (t < k),
    # constant J_ss beyond.
    P_pred_next_head = jnp.concatenate(
        [q["P_pred"][1:], P_pred_ss[None]], axis=0
    )  # P_pred[t+1], t = 0..k-1
    Lp = psd.cholesky(psd.add_jitter(P_pred_next_head, POSTERIOR_JITTER))
    J_head = _mT(psd.chol_solve(Lp, A0 @ q["P_f"]))  # (k, D, D)
    # constant gain in hi precision: a bias in J_ss drifts the smoothed
    # means over the entire late segment (see _hi)
    with psd.latency_mode():
        Lps = psd.cholesky(psd.add_jitter(ops["P_pred_hi"], POSTERIOR_JITTER))
        J_ss_hi = _mT(psd.chol_solve(Lps, ops["A0_hi"] @ ops["P_ss_hi"]))
    J_ss = J_ss_hi.astype(dtype)

    # ---- smoothed means ----
    means_late, m_pred_late = f["means_late"], f["m_pred_late"]
    # late segment t = k..N-2 backward with constant gain
    w_mid = means_late[:-1] - m_pred_late[1:] @ J_ss.T
    u = affine_const_states(
        J_ss, jnp.flip(w_mid, 0), means_late[-1], block_len=block_len
    )  # u[i] = m_s[N-2-i]
    ms_late = jnp.concatenate([jnp.flip(u, 0), means_late[-1:]], axis=0)
    # head t = k-1..0 backward with per-step gains (blocked affine engine)
    from . import block as blk

    m_pred_next_head = jnp.concatenate(
        [q["m_pred"][1:], m_pred_late[:1]], axis=0
    )
    w_head = q["means"] - jnp.einsum("tij,tj->ti", J_head, m_pred_next_head)
    sm = blk.affine_prefix_states(
        jnp.flip(J_head, 0), jnp.flip(w_head, 0), None, ms_late[0], None,
        n_blocks=n_blocks,
    )
    ms_head = jnp.flip(sm.mean, 0)
    means_s = jnp.concatenate([ms_head, ms_late], axis=0)  # (N, D)

    # ---- smoothed covariances (segment-wise; never (N, D, D)) ----
    C_mid_hi = psd.symmetrize(
        ops["P_ss_hi"] - J_ss_hi @ ops["P_pred_hi"] @ J_ss_hi.T
    )
    P_s_ss_hi = _smoothed_cov_fixed_point(J_ss_hi, C_mid_hi, N)
    C_mid = C_mid_hi.astype(dtype)
    P_s_ss = P_s_ss_hi.astype(dtype)

    def tail_step(P, _):
        Pn = psd.symmetrize(C_mid + J_ss @ P @ J_ss.T)
        return Pn, Pn

    _, P_tail_rev_rest = jax.lax.scan(
        tail_step, P_ss_f, None, length=kt - 1
    )
    P_tail_rev = jnp.concatenate([P_ss_f[None], P_tail_rev_rest], axis=0)
    P_tail = jnp.flip(P_tail_rev, 0)  # t = N-kt .. N-1

    def head_step(P_next, sl):
        J_t, P_f_t, P_pred_n = sl
        Pn = psd.symmetrize(
            P_f_t + J_t @ (P_next - P_pred_n) @ _mT(J_t)
        )
        return Pn, Pn

    _, P_head_rev = jax.lax.scan(
        head_step, P_s_ss,
        (jnp.flip(J_head, 0), jnp.flip(q["P_f"], 0),
         jnp.flip(P_pred_next_head, 0)),
    )
    P_head = jnp.flip(P_head_rev, 0)  # t = 0..k-1

    # ---- emission projection, segment-wise ----
    e_single = lti._single(emis_use)
    mid_len = N - k - kt
    if isinstance(emis_use, em.ScalarEmissions):
        H = e_single.H.astype(dtype)
        h, s = e_single.h, e_single.s
        mu = means_s @ H + h
        v_head = jnp.einsum("i,nij,j->n", H, P_head, H)
        v_mid = jnp.broadcast_to(H @ P_s_ss @ H, (mid_len,))
        v_tail = jnp.einsum("i,nij,j->n", H, P_tail, H)
        var = jnp.concatenate([v_head, v_mid, v_tail]) + s
    else:
        H_eff, h_eff, R_kind, R_payload = lti._effective_emission(e_single)
        H_eff = H_eff.astype(dtype)
        mu = means_s @ H_eff.T + h_eff
        v_head = jnp.einsum("ij,njk,ik->ni", H_eff, P_head, H_eff)
        v_mid = jnp.broadcast_to(
            jnp.einsum("ij,jk,ik->i", H_eff, P_s_ss, H_eff),
            (mid_len, H_eff.shape[0]),
        )
        v_tail = jnp.einsum("ij,njk,ik->ni", H_eff, P_tail, H_eff)
        var = jnp.concatenate([v_head, v_mid, v_tail], axis=0)
        var = var + (
            R_payload if R_kind == "diag" else jnp.diagonal(R_payload)
        )
    return mu, var
