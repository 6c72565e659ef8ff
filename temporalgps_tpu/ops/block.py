"""Block-parallel Kalman engine: the TPU speed-of-light path for huge N.

The pure associative-scan engine (ops/assoc.py) materialises 5-tuple elements
and makes O(log N) passes over them in HBM. This engine restructures the same
element algebra into a two-level scheme that makes ~2 passes over the data and
keeps the per-step math as big batched einsums:

  Phase 1  reshape time into (L, B) [B blocks of length L]; one `lax.scan`
           over L with the B blocks as a batch axis, sequentially combining
           filtering elements *within* each block -> B block-aggregate
           elements. Carry-only: O(B) memory, elements never hit HBM.
  Phase 2  prefix-combine the B aggregates (+ prior element) with a tiny
           associative scan -> exact filtering state at each block start.
  Phase 3  one more `lax.scan` over L, running the *plain* Kalman recursion
           inside every block in parallel from its exact start state,
           accumulating the per-block lml (carry-only) or emitting states.

Time-invariant (`Fill`) parameters stay closed over, so a RegularSpacing
Matern model reads only y (+ O(B) element state) from HBM: the engine is
bandwidth-optimal. A remainder tail of N mod B steps runs sequentially.

Reverse-ordered models fall back to the associative engine (they arise for
posteriors, whose construction is already parallel there).
"""

import functools

import jax
import jax.numpy as jnp

from ..models import emissions as em
from ..ops import lgc
from ..utils import psd
from ..utils.fill import Fill, is_fill, scan_emit, time_length
from ..utils.gaussian import Gaussian
from . import assoc


def _default_blocks(N: int, D: int = 1) -> int:
    """Pick a block count: large enough to feed the VPU/MXU, small enough to
    keep the phase-1/3 scan short. ~sqrt(N)*8, power of two, capped.

    For large state dims the per-step D^3 compute already feeds the MXU, so
    fewer, fatter blocks win (measured on v5e at D=150: 141 ms at B=32 vs
    162 ms at B=128) — and a shallower cross-block combine tree also keeps
    the f32 element algebra away from its conditioning cliff (B=128 at D=150
    NaNs on TPU where B<=64 is fine)."""
    b = 1
    target = int(8 * (N ** 0.5))
    cap = 8192 if D <= 16 else 32
    while b * 2 <= min(target, cap):
        b *= 2
    return max(b, 1)


def _split_tree(tree, B, L):
    """Array leaves (N,...) -> (L, B, ...) for scanning; Fill leaves survive
    as Fills of length L (still closed over)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree, is_leaf=is_fill)

    def go(l):
        if is_fill(l):
            return Fill(l.value, L)
        head = l[: B * L].reshape((B, L) + l.shape[1:])
        return jnp.swapaxes(head, 0, 1)

    return jax.tree_util.tree_unflatten(treedef, [go(l) for l in leaves])


def _tail_tree(tree, start):
    leaves, treedef = jax.tree_util.tree_flatten(tree, is_leaf=is_fill)

    def go(l):
        if is_fill(l):
            return Fill(l.value, l.N - start)
        return l[start:]

    return jax.tree_util.tree_unflatten(treedef, [go(l) for l in leaves])


def _step_element(params, D, dtype):
    """Filtering element of a single step, batched over leading axes.
    Same algebra as assoc._filter_elements but on a per-step slice."""
    ((A, a, Q), e), yt = params
    I = jnp.eye(D, dtype=dtype)
    if isinstance(e, em.ScalarEmissions):
        H, h, s = e.H, e.h, e.s
        S = jnp.einsum("...i,...ij,...j->...", H, Q, H) + s
        K = jnp.einsum("...ij,...j->...i", Q, H) / S[..., None]
        ImKH = I - K[..., :, None] * H[..., None, :]
        A_e = ImKH @ A
        resid = yt - (jnp.einsum("...i,...i->...", H, a) + h)
        b_e = a + K * resid[..., None]
        C_e = psd.symmetrize(ImKH @ Q)
        w = jnp.einsum("...ji,...j->...i", A, H)
        eta_e = w * (resid / S)[..., None]
        J_e = psd.symmetrize(
            w[..., :, None] * w[..., None, :] / S[..., None, None]
        )
        return (A_e, b_e, C_e, eta_e, J_e)
    # vector emissions with diagonal noise (Large / Bottleneck, the DTC
    # path): input-space factorised element — no Dout-dim Cholesky.
    if (diag := assoc._diag_emission_params(e)) is not None:
        Hd, dd, s_diag = diag
        return assoc.element_dense_diag(A, a, Q, Hd, dd, s_diag, yt)
    # dense-noise vector emissions: effective dense (H, d, R) per slice
    H, d, R = _dense_emission_slice(e)
    S = psd.symmetrize(H @ Q @ _mT(H) + R)
    Ls = psd.cholesky(S)
    K = _mT(psd.chol_solve(Ls, H @ Q))  # (..., D, Dout)
    ImKH = I - K @ H
    A_e = ImKH @ A
    resid = yt - (jnp.einsum("...ij,...j->...i", H, a) + d)
    b_e = a + jnp.einsum("...ij,...j->...i", K, resid)
    C_e = psd.symmetrize(ImKH @ Q)
    HtSinv = _mT(psd.chol_solve(Ls, H))  # (..., D, Dout)
    FtH = _mT(A) @ HtSinv
    eta_e = jnp.einsum("...ij,...j->...i", FtH, resid)
    J_e = psd.symmetrize(FtH @ H @ A)
    return (A_e, b_e, C_e, eta_e, J_e)


def _dense_emission_slice(e):
    """(H, d, R) of one emission slice, batched over leading axes
    (per-slice counterpart of assoc._dense_emission_params)."""
    if isinstance(e, em.DenseEmissions):
        return e.H, e.h, e.S
    if isinstance(e, em.LargeEmissions):
        R = e.s_diag[..., None] * jnp.eye(e.s_diag.shape[-1], dtype=e.s_diag.dtype)
        return e.C, e.c, R
    if isinstance(e, em.BottleneckEmissions):
        A = e.C @ e.H
        d = jnp.einsum("...ij,...j->...i", e.C, e.h) + e.c
        R = e.s_diag[..., None] * jnp.eye(e.s_diag.shape[-1], dtype=e.s_diag.dtype)
        return A, d, R
    raise TypeError(type(e))


def _mT(X):
    return jnp.swapaxes(X, -1, -2)


def _identity_element(B, D, dtype):
    return (
        jnp.broadcast_to(jnp.eye(D, dtype=dtype), (B, D, D)),
        jnp.zeros((B, D), dtype),
        jnp.zeros((B, D, D), dtype),
        jnp.zeros((B, D), dtype),
        jnp.zeros((B, D, D), dtype),
    )


def _supports(model) -> bool:
    return model.trans.forward


def _lanes_supported(model) -> bool:
    return (
        _supports(model)
        and isinstance(model.emis, em.ScalarEmissions)
        and model.latent_dim <= 3
    )


# ---------------------------------------------------------------------------
# Lane-major fast path (scalar emissions, D <= 3): see ops/lanes.py
# ---------------------------------------------------------------------------

def _decompose_blocked(blocked, D):
    """Blocked parameter tree -> lane-major component tree."""
    from . import lanes

    ((As, offs, Qs), emis), y = blocked
    trans_c = (
        lanes.decompose_mat(As, D),
        lanes.decompose_vec(offs, D),
        lanes.decompose_mat(Qs, D),
    )
    emis_c = (lanes.decompose_vec(emis.H, D), emis.h, emis.s)
    return (trans_c, emis_c), y


def _identity_element_lanes(B, D, dtype):
    from . import lanes

    ones = jnp.ones((B,), dtype)
    zeros = jnp.zeros((B,), dtype)
    zmat = tuple(tuple(zeros for _ in range(D)) for _ in range(D))
    return (lanes.eye(D, ones, zeros), (zeros,) * D, zmat, (zeros,) * D, zmat)


def _phase1_aggregates_lanes(blocked, B, D, dtype):
    from . import lanes

    blocked_c = _decompose_blocked(blocked, D)

    def step(carry, sl):
        ((A, a, Q), (H, h, s)), yt = sl
        e = lanes.step_element(A, a, Q, H, h, s, yt, 1.0, 0.0)
        return None, lanes.combine(carry, e)

    _, agg_c = scan_emit(step, blocked_c, _identity_element_lanes(B, D, dtype))
    from .lanes import mat_to_array, vec_to_array

    return (
        mat_to_array(agg_c[0]),
        vec_to_array(agg_c[1]),
        mat_to_array(agg_c[2]),
        vec_to_array(agg_c[3]),
        mat_to_array(agg_c[4]),
    )


def _phase3_lml_lanes(blocked, starts_head, B, D, dtype):
    """Per-block lml sums from exact block-start states (lane-major)."""
    from . import lanes

    blocked_c = _decompose_blocked(blocked, D)
    m0 = tuple(starts_head.mean[:, i] for i in range(D))
    P0 = tuple(
        tuple(starts_head.cov[:, i, j] for j in range(D)) for i in range(D)
    )

    def step(carry, sl):
        m, P, acc = carry
        ((A, a, Q), (H, h, s)), yt = sl
        m, P, lml = lanes.kalman_step(m, P, A, a, Q, H, h, s, yt)
        return None, (m, P, acc + lml)

    _, (_, _, lml_blocks) = scan_emit(
        step, blocked_c, (m0, P0, jnp.zeros((B,), dtype))
    )
    return jnp.sum(lml_blocks)


def _prepare(model, y, n_blocks):
    N = len(model)
    B = n_blocks or _default_blocks(N, model.latent_dim)
    B = min(B, N)
    L = N // B
    params = ((model.trans.As, model.trans.offs, model.trans.Qs), model.emis)
    blocked = _split_tree((params, jnp.asarray(y)), B, L)
    tail = _tail_tree((params, jnp.asarray(y)), B * L)
    return N, B, L, blocked, tail


def _pad_tail(model, y, B, L=None):
    """Pad the series so B divides N exactly (or to B*L for an explicit
    per-block length L, e.g. the Pallas stream plan's chunk multiple),
    instead of running a sequential tail (which would dominate wall time).

    Pad steps reuse the model's own transitions but observe nothing: their
    observation variance is LARGE_VAR and their lml contribution is the
    closed-form constant -dim_out * log(2 pi LARGE_VAR)/2 each, returned as a
    compensation — exactly the reference's missing-data mechanism
    (reference: src/models/missings.jl:43-53) applied to alignment padding.
    Relative error is O(HPH^T / LARGE_VAR) ~ 1e-15.

    Returns (params_padded, y_padded, s_padded_or_None, n_pad, compensation).
    """
    import dataclasses
    import math

    from ..config import LARGE_VAR

    N = len(model)
    if L is None:
        L = -(-N // B)  # ceil
    n_pad = B * L - N
    dtype = model.trans.x0.dtype
    y = jnp.asarray(y, dtype)
    e = model.emis
    scalar = isinstance(e, em.ScalarEmissions)
    s_arr = None
    if scalar:
        s = e.s
        s_arr = (
            jnp.broadcast_to(s.value, (s.N,)).astype(dtype)
            if is_fill(s)
            else jnp.asarray(s, dtype)
        )
    if n_pad == 0:
        params = ((model.trans.As, model.trans.offs, model.trans.Qs), e)
        return params, y, s_arr, 0, jnp.zeros((), dtype)

    dout = em.dim_out(e) if not scalar else 1
    comp = jnp.asarray(
        n_pad * dout * 0.5 * math.log(2.0 * math.pi * LARGE_VAR), dtype
    )

    def pad_leaf(leaf, pad_value_fn):
        if is_fill(leaf):
            return Fill(leaf.value, leaf.N + n_pad)
        pad = jnp.broadcast_to(pad_value_fn(leaf), (n_pad,) + leaf.shape[1:])
        return jnp.concatenate([leaf, pad.astype(leaf.dtype)], axis=0)

    def pad_array(arr, fill_value):
        pad = jnp.full((n_pad,) + arr.shape[1:], fill_value, arr.dtype)
        return jnp.concatenate([arr, pad], axis=0)

    t = model.trans
    D = model.latent_dim
    As_p = pad_leaf(t.As, lambda l: jnp.eye(D, dtype=l.dtype))
    offs_p = pad_leaf(t.offs, lambda l: jnp.zeros((D,), l.dtype))
    Qs_p = pad_leaf(t.Qs, lambda l: jnp.zeros((D, D), l.dtype))

    zeros_like_leaf = lambda l: jnp.zeros(jnp.shape(l)[1:], l.dtype)
    if scalar:
        y_p = pad_array(y, 0.0)
        s_p = jnp.concatenate([s_arr, jnp.full((n_pad,), LARGE_VAR, dtype)])
        e_p = em.ScalarEmissions(
            H=pad_leaf(e.H, zeros_like_leaf), h=pad_leaf(e.h, zeros_like_leaf), s=s_p
        )
        return ((As_p, offs_p, Qs_p), e_p), y_p, s_p, n_pad, comp

    y_p = pad_array(y, 0.0)
    if isinstance(e, em.DenseEmissions):
        S = e.S
        S_arr = (
            jnp.broadcast_to(S.value, (S.N,) + jnp.shape(S.value)).astype(dtype)
            if is_fill(S)
            else jnp.asarray(S, dtype)
        )
        S_pad = jnp.broadcast_to(
            LARGE_VAR * jnp.eye(dout, dtype=dtype), (n_pad, dout, dout)
        )
        e_p = em.DenseEmissions(
            H=pad_leaf(e.H, zeros_like_leaf),
            h=pad_leaf(e.h, zeros_like_leaf),
            S=jnp.concatenate([S_arr, S_pad], axis=0),
        )
    else:  # Large / Bottleneck: diagonal noise leaf
        sd = e.s_diag
        sd_arr = (
            jnp.broadcast_to(sd.value, (sd.N,) + jnp.shape(sd.value)).astype(dtype)
            if is_fill(sd)
            else jnp.asarray(sd, dtype)
        )
        sd_p = jnp.concatenate(
            [sd_arr, jnp.full((n_pad, dout), LARGE_VAR, dtype)], axis=0
        )
        fields = {
            f.name: pad_leaf(getattr(e, f.name), zeros_like_leaf)
            for f in dataclasses.fields(e)
            if f.name != "s_diag"
        }
        e_p = dataclasses.replace(e, s_diag=sd_p, **{
            k: v for k, v in fields.items()
        })
    return ((As_p, offs_p, Qs_p), e_p), y_p, None, n_pad, comp


def _phase1_aggregates(blocked, B, D, dtype):
    def phase1_step(carry, sl):
        elem = _step_element(sl, D, dtype)
        return None, assoc._combine_filter(carry, elem)

    if D > 8:
        # Reverse-mode through the phase scan would otherwise store every
        # element-construction intermediate per step (~63GB at the DTC
        # Nt=100k, D=30 workload); remat keeps only the carried element.
        phase1_step = jax.checkpoint(phase1_step)
    _, agg = scan_emit(phase1_step, blocked, _identity_element(B, D, dtype))
    return agg


def _phase2_prefix(elems, phase2):
    """Prefix-combine the (B+1)-leading element tuple; phase2="sqrt" routes
    the combine through the square-root algebra (ops/sqrt.py), which stays
    finite past the f32 covariance-form conditioning cliff (B=128 at D=150
    NaNs in covariance form on TPU). Returns the covariance-form prefix."""
    if phase2 == "sqrt":
        from . import sqrt as sq

        sq.check_dim(elems[0].shape[-1])
        pref = jax.lax.associative_scan(
            sq._combine_sqrt, sq.to_sqrt_element(elems), axis=0
        )
        return sq.from_sqrt_element(pref)
    return jax.lax.associative_scan(assoc._combine_filter, elems, axis=0)


def _prior_element(x0: Gaussian, D, dtype):
    return (
        jnp.zeros((1, D, D), dtype),
        x0.mean[None].astype(dtype),
        psd.symmetrize(x0.cov)[None].astype(dtype),
        jnp.zeros((1, D), dtype),
        jnp.zeros((1, D, D), dtype),
    )


def block_filter_states(model, y, *, n_blocks=None, phase2=None):
    """Exact filtering state at each block start (phase 1 + 2).

    Returns (B, L, blocked_params, tail_params, starts) where starts is a
    Gaussian with leading axis B+1: starts[b] is the filtering distribution
    just before block b; starts[B] feeds the tail.
    """
    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    N, B, L, blocked, tail = _prepare(model, y, n_blocks)

    agg = _phase1_aggregates(blocked, B, D, dtype)

    # Phase 2: prefix over the B aggregates with the prior prepended.
    prior = _prior_element(x0, D, dtype)
    elems = tuple(jnp.concatenate([p, a], axis=0) for p, a in zip(prior, agg))
    pref = _phase2_prefix(elems, phase2)
    starts = Gaussian(pref[1], pref[2])  # (B+1, D) / (B+1, D, D)
    return B, L, blocked, tail, starts


# ---------------------------------------------------------------------------
# Chunk-level API — used per-device by the multi-chip sharded engine
# ---------------------------------------------------------------------------

def chunk_total_element(params_y, D, dtype, *, n_blocks=None):
    """Total filtering element of a parameter chunk.

    params_y = (((As, offs, Qs), emis), y) with a local time axis. Combines
    all per-step elements (blocked phase 1 + fold) into ONE element
    representing p(x_end | x_start, y_chunk) — the quantity exchanged between
    devices by the distributed filter.
    """
    N = time_length(params_y)
    B = min(n_blocks or _default_blocks(N, D), N)
    L = N // B
    blocked = _split_tree(params_y, B, L)
    tail = _tail_tree(params_y, B * L)

    agg = _phase1_aggregates(blocked, B, D, dtype)  # leaves (B, ...)

    single_ident = (
        jnp.eye(D, dtype=dtype),
        jnp.zeros((D,), dtype),
        jnp.zeros((D, D), dtype),
        jnp.zeros((D,), dtype),
        jnp.zeros((D, D), dtype),
    )

    def fold(carry, e):
        return assoc._combine_filter(carry, e), None

    total, _ = jax.lax.scan(fold, single_ident, agg)

    if time_length(tail) > 0:
        def fold_tail(carry, sl):
            return None, assoc._combine_filter(carry, _step_element(sl, D, dtype))

        _, total = scan_emit(fold_tail, tail, total)
    return total


def chunk_logpdf_from_start(params_y, start: Gaussian, D, dtype, *, n_blocks=None, phase2=None):
    """Sum of per-step lmls over a chunk given the exact filtering
    distribution at the chunk start."""
    N = time_length(params_y)
    B = min(n_blocks or _default_blocks(N, D), N)
    L = N // B
    blocked = _split_tree(params_y, B, L)
    tail = _tail_tree(params_y, B * L)

    agg = _phase1_aggregates(blocked, B, D, dtype)
    prior = _prior_element(start, D, dtype)
    elems = tuple(jnp.concatenate([p, a], axis=0) for p, a in zip(prior, agg))
    pref = _phase2_prefix(elems, phase2)
    starts = Gaussian(pref[1], pref[2])

    def phase3_step(carry, sl):
        x, acc = carry
        ((A, a, Q), e), yt = sl
        xp = lgc.predict(x, A, a, Q)
        xf, lml = em.step_posterior_and_lml(xp, e, yt)
        return None, (xf, acc + lml)

    if D > 8:
        phase3_step = jax.checkpoint(phase3_step)  # see _phase1_aggregates
    init = (Gaussian(starts.mean[:-1], starts.cov[:-1]), jnp.zeros((B,), dtype))
    _, (_, lml_blocks) = scan_emit(phase3_step, blocked, init)
    total = jnp.sum(lml_blocks)

    if time_length(tail) > 0:
        x_tail = Gaussian(starts.mean[-1], starts.cov[-1])

        def tail_step(x, sl):
            ((A, a, Q), e), yt = sl
            xp = lgc.predict(x, A, a, Q)
            xf, lml = em.step_posterior_and_lml(xp, e, yt)
            return lml, xf

        lmls, _ = scan_emit(tail_step, tail, x_tail)
        total = total + jnp.sum(lmls)
    return total


def _pallas_supported(model) -> bool:
    t = model.trans
    e = model.emis
    return (
        _lanes_supported(model)
        and is_fill(t.As)
        and is_fill(t.offs)
        and is_fill(t.Qs)
        and is_fill(e.H)
        and is_fill(e.h)
    )


# Max block count handled by the fused phase-2 kernel: the whole (K, B)
# component array plus the Kogge-Stone level temporaries must fit scoped
# VMEM (16MB/core). Measured: B=16384 allocates 59.2MB (Mosaic keeps ~27
# (K, B) f32 buffers live across the unrolled levels) -> cap where that
# scales to ~7.4MB. Total in-kernel work is B-independent (phases 1/3 do N
# steps either way), so smaller B costs nothing.
_PHASE2_FUSED_MAX_B = 2048


def _pallas_blocks(N: int) -> int:
    """Block count for the Pallas path: target within-block length ~32 (short
    blocks unroll inside the kernel; longer ones fori_loop), power of two,
    capped at the fused-phase-2 VMEM bound (in-kernel loop steps are ~free
    next to a wider cross-block prefix)."""
    target = max(N // 32, min(N, 256))
    b = 1
    while b * 2 <= min(target, _PHASE2_FUSED_MAX_B):
        b *= 2
    return max(b, 1)


def _logpdf_pallas_impl(model, y, n_blocks, phase2=None):
    from . import pallas_kernels as pk

    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    N = len(model)
    B = min(n_blocks or _pallas_blocks(N), N)
    DD = D * D

    _bt, _lc, L = pk.stream_plan(N, B)
    _params_p, y_p, s_p, n_pad, comp = _pad_tail(model, y, B, L=L)
    y_main = y_p.reshape(B, L).T  # (L, B)
    s_main = s_p.reshape(B, L).T

    t = model.trans
    packed = pk.pack_params(
        t.As.value, t.offs.value, t.Qs.value, model.emis.H.value,
        model.emis.h.value, dtype,
    )

    comps = pk.phase1_aggregate(y_main, s_main, packed, D)  # (K, B)

    if B <= _PHASE2_FUSED_MAX_B:
        # Single-dispatch in-kernel Kogge-Stone prefix (pk.phase2_starts):
        # the XLA associative_scan alternative costs ~log2(B) dispatch
        # levels — measured 3-5 ms of the N=1M headline (phase_probe.py).
        starts_comp = pk.phase2_starts(
            comps, x0.mean, psd.symmetrize(x0.cov), D
        )
    else:
        A_e = comps[:DD].T.reshape(B, D, D)
        b_e = comps[DD : DD + D].T
        C_e = comps[DD + D : 2 * DD + D].T.reshape(B, D, D)
        eta_e = comps[2 * DD + D : 2 * DD + 2 * D].T
        J_e = comps[2 * DD + 2 * D :].T.reshape(B, D, D)

        prior = _prior_element(x0, D, dtype)
        elems = tuple(
            jnp.concatenate([p, a], axis=0)
            for p, a in zip(prior, (A_e, b_e, C_e, eta_e, J_e))
        )
        pref = _phase2_prefix(elems, phase2)
        starts = Gaussian(pref[1], pref[2])  # (B+1, ...)

        starts_comp = jnp.concatenate(
            [starts.mean[:-1].T, starts.cov[:-1].reshape(B, DD).T], axis=0
        )  # (D + DD, B)
    lml = jnp.sum(pk.phase3_lml(y_main, s_main, packed, starts_comp, D))
    return lml + comp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _logpdf_pallas_cv(model, y, n_blocks, prec=None):
    return _logpdf_pallas_impl(model, y, n_blocks)


def _logpdf_pallas_fwd(model, y, n_blocks, prec=None):
    return _logpdf_pallas_impl(model, y, n_blocks), (model, y)


def _logpdf_pallas_bwd(n_blocks, prec, res, g):
    from ..config import matmul_precision_ctx

    model, y = res
    # Backward through the XLA engine (same function, different schedule),
    # under the matmul precision captured at the fwd call site — custom_vjp
    # bwd traces outside the caller's precision scope
    # (config.ambient_matmul_precision). Ambient None = the TPU bf16
    # default, never right for a reverse pass (measured 5.8e-3 rel grads
    # at D=3, N=8192, probes/tpu_smoke.py g1): floor at 'highest'.
    with matmul_precision_ctx(prec or "highest"):
        _, vjp = jax.vjp(lambda m, yy: _logpdf_xla(m, yy, None), model, y)
        return vjp(g)


_logpdf_pallas_cv.defvjp(_logpdf_pallas_fwd, _logpdf_pallas_bwd)


def _fwd_grad_supported(model, model_tangents) -> bool:
    if not _pallas_supported(model):
        return False
    for t in model_tangents:
        tr, e = t.trans, t.emis
        if not (
            isinstance(e, em.ScalarEmissions)
            and is_fill(tr.As) and is_fill(tr.offs) and is_fill(tr.Qs)
            and is_fill(e.H) and is_fill(e.h) and is_fill(e.s)
        ):
            return False
    return True


def logpdf_fwd_grad(model, y, model_tangents, *, n_blocks=None):
    """(logpdf, [d logpdf . tangent_j]) in ONE fused forward-mode pass.

    model_tangents: list of k tangent LGSSMs (same pytree structure, Fill
    time-invariant leaves) — e.g. jax.jvp of the model builder along each
    hyperparameter basis direction. The primal and all k tangent recursions
    run together through the three Pallas phases (pallas_kernels phase*_jvp):
    the primal is computed once, each tangent replays only the in-kernel
    linearisation. Observations carry no tangent; the time-invariant noise
    tangent enters masked so missing-data / alignment-padding steps (whose
    lml term is constant) contribute zero derivative.

    Requires a forward-ordered, Fill-parameter, scalar-emission model with
    D <= 3 (the flagship Matern learning configuration,
    reference: examples/exact_time_learning.jl); raises TypeError otherwise.
    """
    from . import pallas_kernels as pk

    if not _fwd_grad_supported(model, model_tangents):
        raise TypeError(
            "logpdf_fwd_grad requires Fill-parameter scalar-emission models "
            "(primal and tangents) with D <= 3"
        )
    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    N = len(model)
    k = len(model_tangents)
    # The fused phase-2 carries (1+k) element sets, so its VMEM-bound block
    # count shrinks by the same factor (measured: k=3 at B=2048 allocates
    # 31.9MB scoped vs the 16MB cap).
    max_b = max(256, _PHASE2_FUSED_MAX_B // (1 + k))
    b_pow = 1
    while b_pow * 2 <= max_b:
        b_pow *= 2
    B = min(n_blocks or _pallas_blocks(N), b_pow, N)
    SD = D + D * D

    _bt, _lc, L = pk.stream_plan(N, B)
    _params_p, y_p, s_p, n_pad, comp = _pad_tail(model, y, B, L=L)
    # NaN observations are handled natively: large-variance fill + volume
    # compensation (reference: src/models/missings.jl:43-53); the same
    # in-kernel mask that zeroes the noise tangent at padding steps covers
    # them (their streamed s is the LARGE_VAR fill).
    from ..models.missings import _volume_compensation, fill_in_missings

    s_p, y_p, n_missing = fill_in_missings(s_p, y_p)
    comp = comp + _volume_compensation(n_missing, dtype)
    y_main = y_p.reshape(B, L).T
    s_main = s_p.reshape(B, L).T

    def pack(m_, s_slot):
        t = m_.trans
        return pk.pack_params_s(
            t.As.value, t.offs.value, t.Qs.value, m_.emis.H.value,
            m_.emis.h.value, s_slot, dtype,
        )

    # The primal s slot is unused (noise is streamed, with fills); tangent
    # slots carry the time-invariant noise tangent.
    packed = jnp.stack(
        [pack(model, jnp.zeros((), dtype))]
        + [pack(t, t.emis.s.value) for t in model_tangents]
    )

    def prior_row(g: Gaussian):
        return jnp.concatenate(
            [
                jnp.ravel(g.mean).astype(dtype),
                jnp.ravel(psd.symmetrize(g.cov)).astype(dtype),
            ]
        )

    priors = jnp.stack(
        [prior_row(x0)] + [prior_row(t.trans.x0) for t in model_tangents]
    )  # (1+k, SD)

    comps = pk.phase1_jvp(y_main, s_main, packed, D, k)
    starts = pk.phase2_jvp_starts(comps, priors, D, k)
    lml_rows = pk.phase3_jvp_lml(y_main, s_main, packed, starts, D, k)
    totals = jnp.sum(lml_rows, axis=1)  # (1+k,)
    return totals[0] + comp, [totals[1 + j] for j in range(k)]


def _tail_lml(tail, x_tail):
    def tail_step(x, sl):
        ((A, a, Q), e), yt = sl
        xp = lgc.predict(x, A, a, Q)
        xf, lml = em.step_posterior_and_lml(xp, e, yt)
        return lml, xf

    lmls, _ = scan_emit(tail_step, tail, x_tail)
    return jnp.sum(lmls)


def logpdf(model, y, *, n_blocks=None, pallas=None, phase2=None):
    """Block-parallel logpdf. `pallas=None` auto-selects the fused Pallas
    kernels when the model qualifies (time-invariant params, scalar
    emissions, D<=3); `pallas=False` forces the pure-XLA schedule."""
    if not _supports(model):
        return assoc.logpdf(model, y)
    if pallas is None:
        # Auto-select only on real TPU: interpret-mode Pallas (CPU) is far
        # slower than the XLA schedule.
        pallas = jax.default_backend() == "tpu"
    if pallas and _pallas_supported(model):
        from ..config import ambient_matmul_precision

        return _logpdf_pallas_cv(model, y, n_blocks,
                                 ambient_matmul_precision())
    return _logpdf_xla(model, y, n_blocks, phase2)


def _logpdf_xla(model, y, n_blocks=None, phase2=None):
    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    N = len(model)
    B = min(n_blocks or _default_blocks(N, D), N)
    params_p, y_p, _s_p, n_pad, comp = _pad_tail(model, y, B)
    L = (N + n_pad) // B
    blocked = _split_tree((params_p, y_p), B, L)

    if _lanes_supported(model):
        agg = _phase1_aggregates_lanes(blocked, B, D, dtype)
    else:
        agg = _phase1_aggregates(blocked, B, D, dtype)

    prior = _prior_element(x0, D, dtype)
    elems = tuple(jnp.concatenate([p, a], axis=0) for p, a in zip(prior, agg))
    pref = _phase2_prefix(elems, phase2)
    starts = Gaussian(pref[1], pref[2])
    starts_head = Gaussian(starts.mean[:-1], starts.cov[:-1])

    if _lanes_supported(model):
        total = _phase3_lml_lanes(blocked, starts_head, B, D, dtype)
    else:
        def phase3_step(carry, sl):
            x, acc = carry
            ((A, a, Q), e), yt = sl
            xp = lgc.predict(x, A, a, Q)
            xf, lml = em.step_posterior_and_lml(xp, e, yt)
            return None, (xf, acc + lml)

        if D > 8:
            phase3_step = jax.checkpoint(phase3_step)  # see _phase1_aggregates
        init = (starts_head, jnp.zeros((B,), dtype))
        _, (_, lml_blocks) = scan_emit(phase3_step, blocked, init)
        total = jnp.sum(lml_blocks)

    return total + comp


# ---------------------------------------------------------------------------
# Blocked affine-composition engine: latent marginals / sampling / smoothing
# ---------------------------------------------------------------------------
#
# The drivers that don't condition on data (prior marginals, sampling, and
# the smoothing pass of a constructed posterior) are prefix compositions of
# affine-Gaussian maps. The assoc engine materialises N elements and
# prefix-scans them (O(log N) HBM passes + dispatch depth); this blocked
# schedule mirrors the filtering engine: within-block composition (phase 1),
# cross-block prefix over B aggregates (phase 2), within-block replay
# emitting states (phase 3). Lane-major components for D <= 3.


def _affine_pad(F, c, Q, N, B):
    """Pad iteration-order transitions to B*L with identity steps."""
    L = -(-N // B)
    n_pad = B * L - N
    if n_pad == 0:
        return F, c, Q, L
    D = F.shape[-1]
    I = jnp.broadcast_to(jnp.eye(D, dtype=F.dtype), (n_pad, D, D))
    F = jnp.concatenate([F, I], axis=0)
    c = jnp.concatenate([c, jnp.zeros((n_pad, D), c.dtype)], axis=0)
    if Q is not None:
        Q = jnp.concatenate([Q, jnp.zeros((n_pad, D, D), Q.dtype)], axis=0)
    return F, c, Q, L


def _blocked(arr, B, L):
    return jnp.swapaxes(arr.reshape((B, L) + arr.shape[1:]), 0, 1)


def _affine_identity(B, D, dtype, with_cov):
    I = jnp.broadcast_to(jnp.eye(D, dtype=dtype), (B, D, D))
    b = jnp.zeros((B, D), dtype)
    if with_cov:
        return (I, b, jnp.zeros((B, D, D), dtype))
    return (I, b)


def affine_prefix_states(F, c, Q, x0_mean, x0_cov, *, n_blocks=None):
    """States x_t of the affine recursion x_t = F_t x_{t-1} + c_t (+ noise
    cov Q_t), t = 1..N, from x_0 ~ (x0_mean, x0_cov); returns a stacked
    Gaussian (cov None when Q is None — pure mean composition for
    sampling). Inputs in iteration order, (N, ...) arrays."""
    N = F.shape[0]
    D = F.shape[-1]
    dtype = F.dtype
    with_cov = Q is not None
    B = min(n_blocks or _default_blocks(N, D), N)
    F_p, c_p, Q_p, L = _affine_pad(F, c, Q, N, B)
    Fb, cb = _blocked(F_p, B, L), _blocked(c_p, B, L)
    Qb = _blocked(Q_p, B, L) if with_cov else None

    use_lanes = D <= 3
    if use_lanes:
        from . import lanes

        def to_c(sl_F, sl_c, sl_Q):
            out = (
                lanes.decompose_mat(sl_F, D),
                lanes.decompose_vec(sl_c, D),
            )
            if with_cov:
                out = out + (lanes.decompose_mat(sl_Q, D),)
            return out

        ones = jnp.ones((B,), dtype)
        zeros = jnp.zeros((B,), dtype)
        ident = (lanes.eye(D, ones, zeros), (zeros,) * D) + (
            (tuple(tuple(zeros for _ in range(D)) for _ in range(D)),)
            if with_cov
            else ()
        )

        def combine_lanes(e_i, e_j):
            A = lanes.mm(e_j[0], e_i[0])
            b = lanes.vadd(lanes.mv(e_j[0], e_i[1]), e_j[1])
            if not with_cov:
                return (A, b)
            C = lanes.madd(
                lanes.sym(lanes.mmT(lanes.mm(e_j[0], e_i[2]), e_j[0])), e_j[2]
            )
            return (A, b, C)

        params_c = to_c(Fb, cb, Qb)

        def p1_step(carry, sl):
            e = (sl[0], sl[1]) + ((sl[2],) if with_cov else ())
            return None, combine_lanes(carry, e)

        _, agg_c = scan_emit(p1_step, params_c, ident)
        agg = (
            lanes.mat_to_array(agg_c[0]),
            lanes.vec_to_array(agg_c[1]),
        ) + ((lanes.mat_to_array(agg_c[2]),) if with_cov else ())
    else:
        def p1_step(carry, sl):
            e = (sl[0], sl[1]) + ((sl[2],) if with_cov else ())
            comb = assoc._combine_affine if with_cov else assoc._combine_affine_mean
            return None, comb(carry, e)

        if D > 8:
            p1_step = jax.checkpoint(p1_step)  # see _phase1_aggregates
        params = (Fb, cb) + ((Qb,) if with_cov else ())
        _, agg = scan_emit(p1_step, params, _affine_identity(B, D, dtype, with_cov))

    # Phase 2: prefix over aggregates with the initial state prepended.
    prior = (jnp.zeros((1, D, D), dtype), x0_mean[None].astype(dtype)) + (
        (psd.symmetrize(x0_cov)[None].astype(dtype),) if with_cov else ()
    )
    elems = tuple(jnp.concatenate([p, a], axis=0) for p, a in zip(prior, agg))
    comb = assoc._combine_affine if with_cov else assoc._combine_affine_mean
    pref = jax.lax.associative_scan(comb, elems, axis=0)
    starts_mean = pref[1][:-1]
    starts_cov = pref[2][:-1] if with_cov else None

    # Phase 3: replay within blocks from the exact starts, emitting states.
    if use_lanes:
        from . import lanes

        m0c = tuple(starts_mean[:, i] for i in range(D))
        init = (m0c,) + (
            (
                tuple(
                    tuple(starts_cov[:, i, j] for j in range(D))
                    for i in range(D)
                ),
            )
            if with_cov
            else ()
        )

        def p3_step(carry, sl):
            A, b = sl[0], sl[1]
            m = lanes.vadd(lanes.mv(A, carry[0]), b)
            if with_cov:
                P = lanes.madd(
                    lanes.sym(lanes.mmT(lanes.mm(A, carry[1]), A)), sl[2]
                )
                return (m, P), (m, P)
            return (m,), (m,)

        outs, _ = scan_emit(p3_step, params_c, init)
        mean_b = lanes.vec_to_array(outs[0])  # (L, B, D)
        cov_b = lanes.mat_to_array(outs[1]) if with_cov else None
    else:
        def p3_step(carry, sl):
            A, b = sl[0], sl[1]
            m = jnp.einsum("...ij,...j->...i", A, carry[0]) + b
            if with_cov:
                P = psd.symmetrize(A @ carry[1] @ _mT(A) + sl[2])
                return (m, P), (m, P)
            return (m,), (m,)

        init = (starts_mean,) + ((starts_cov,) if with_cov else ())
        outs, _ = scan_emit(p3_step, params, init)
        mean_b = outs[0]
        cov_b = outs[1] if with_cov else None

    mean = jnp.swapaxes(mean_b, 0, 1).reshape((-1, D))[:N]
    if not with_cov:
        return Gaussian(mean, None)
    cov = jnp.swapaxes(cov_b, 0, 1).reshape((-1, D, D))[:N]
    return Gaussian(mean, cov)


def latent_marginals(model, *, n_blocks=None) -> Gaussian:
    """Latent-chain marginals on the blocked affine schedule (same contract
    as assoc.latent_marginals)."""
    F_ev, c_ev, Q_ev, _F_it, _c_it, _Q_it, _emis, _y = assoc._iteration_view(model)
    x0 = model.trans.x0
    xs = affine_prefix_states(
        F_ev, c_ev, Q_ev, x0.mean, x0.cov, n_blocks=n_blocks
    )
    return assoc._unflip(model, xs)


def rand_with_eps(model, eps_t, eps_e, x_init, *, n_blocks=None):
    """Joint sample on the blocked affine schedule (same contract as
    assoc.rand_with_eps)."""
    F_ev, c_ev, Q_ev, _F_it, _c_it, _Q_it, emis_it, _y = assoc._iteration_view(model)
    if not model.trans.forward:
        eps_t = jnp.flip(eps_t, 0)
        eps_e = jnp.flip(eps_e, 0)
        eps_t = jnp.concatenate([jnp.zeros_like(eps_t[:1]), eps_t[:-1]], axis=0)
    Lq = psd.cholesky(psd.add_jitter(psd.symmetrize(Q_ev), 1e-9))
    b = c_ev + jnp.einsum("nij,nj->ni", Lq, eps_t)
    xs = affine_prefix_states(
        F_ev, b, None, x_init, None, n_blocks=n_blocks
    )
    ys = em.step_conditional_rand(eps_e, xs.mean, emis_it)
    return assoc._unflip(model, ys)


# ---------------------------------------------------------------------------
# Component-major posterior pipeline (Pallas, scalar emissions, D <= 3)
# ---------------------------------------------------------------------------

def _comps_to_mats(rows, D, off=0):
    """(SD/KT, N) component rows -> lanes-style nested tuples of (N,)."""
    m = tuple(rows[off + i] for i in range(D))
    P = tuple(
        tuple(rows[off + D + r * D + c] for c in range(D)) for r in range(D)
    )
    return m, P


def _scalar_mat(M, D):
    return tuple(tuple(M[r, c] for c in range(D)) for r in range(D))


def _posterior_pallas(model, y, n_blocks=None):
    """block.posterior in component-major form: Pallas filter-state pipeline
    + lane-layout batched dynamics inversion. Same semantics/containers as
    the generic path; ~none of the (N, D, D)-layout relayout traffic."""
    from ..config import POSTERIOR_JITTER
    from . import lanes
    from . import pallas_kernels as pk
    from ..models.gauss_markov import GaussMarkov
    from ..models.lgssm import LGSSM

    D = model.latent_dim
    SD = D + D * D
    x0 = model.trans.x0
    dtype = x0.dtype
    N = len(model)
    B = min(n_blocks or _pallas_blocks(N), N)
    b_tile, Lc, L = pk._state_plan(N, B, rows=2 + SD)
    _params_p, y_p, s_p, _n_pad, _comp = _pad_tail(model, y, B, L=L)
    y_main = y_p.reshape(B, L).T
    s_main = s_p.reshape(B, L).T
    t = model.trans
    packed = pk.pack_params(
        t.As.value, t.offs.value, t.Qs.value, model.emis.H.value,
        model.emis.h.value, dtype,
    )
    comps = pk.phase1_aggregate(y_main, s_main, packed, D, plan=(b_tile, Lc))
    starts = pk.phase2_starts(comps, x0.mean, psd.symmetrize(x0.cov), D)
    st = pk.phase3_states(y_main, s_main, packed, starts, D, plan=(b_tile, Lc))
    xf = jnp.reshape(jnp.swapaxes(st, 1, 2), (SD, B * L))[:, :N]

    mf, Pf = _comps_to_mats(xf, D)
    x0P = psd.symmetrize(x0.cov)
    shift = lambda comp, init: jnp.concatenate(
        [jnp.reshape(jnp.asarray(init, dtype), (1,)), comp[:-1]]
    )
    m_prev = tuple(shift(mf[i], x0.mean[i]) for i in range(D))
    P_prev = tuple(
        tuple(shift(Pf[r][c], x0P[r, c]) for c in range(D)) for r in range(D)
    )
    A_c = _scalar_mat(t.As.value, D)
    a_c = tuple(t.offs.value[i] for i in range(D))
    Q_c = _scalar_mat(t.Qs.value, D)

    mp = lanes.vadd(lanes.mv(A_c, m_prev), a_c)
    Pp = lanes.madd(lanes.sym(lanes.mmT(lanes.mm(A_c, P_prev), A_c)), Q_c)
    Ppj = tuple(
        tuple(
            Pp[r][c] + (POSTERIOR_JITTER if r == c else 0.0) for c in range(D)
        )
        for r in range(D)
    )
    # Same reversed-dynamics algebra as models/lgssm._invert_dynamics, with
    # the D<=3 adjugate inverse in lane layout.
    G = lanes.mm(lanes.inv(Ppj), lanes.mm(A_c, P_prev))
    A_rev = tuple(tuple(G[c][r] for c in range(D)) for r in range(D))
    a_rev = lanes.vsub(m_prev, lanes.mTv(G, mp))
    Q_rev = lanes.msub(P_prev, lanes.mTm(G, lanes.mm(Ppj, G)))

    x_last = Gaussian(
        jnp.stack([mf[i][-1] for i in range(D)]),
        jnp.stack(
            [jnp.stack([Pf[r][c][-1] for c in range(D)]) for r in range(D)]
        ),
    )
    new_trans = GaussMarkov(
        As=lanes.mat_to_array(A_rev),
        offs=lanes.vec_to_array(a_rev),
        Qs=lanes.mat_to_array(Q_rev),
        x0=x_last,
        forward=False,
        det_blocks=model.trans.det_blocks,
    )
    return LGSSM(new_trans, model.emis)


def _affine_comps_iteration(model):
    """Iteration-order affine parameter comps (KT, N) + initial state for
    the latent-marginal prefix (identity-shifted, flipped for Reverse
    models — cf. assoc._iteration_view)."""
    from . import lanes
    from ..utils.fill import tmaterialize

    D = model.latent_dim
    N = len(model)
    F = tmaterialize(model.trans.As)
    c = tmaterialize(model.trans.offs)
    Q = tmaterialize(model.trans.Qs)
    dtype = F.dtype
    rows = []
    if model.trans.forward:
        # Forward: transition-then-emit — marginal j includes transition j.
        for r in range(D):
            for cc in range(D):
                rows.append(F[:, r, cc])
        for i in range(D):
            rows.append(c[:, i])
        for r in range(D):
            for cc in range(D):
                rows.append(Q[:, r, cc])
        return jnp.stack(rows)
    # Reverse: emit-then-transition — flip to iteration order and shift by
    # one with the identity map, as in assoc._iteration_view.
    F, c, Q = jnp.flip(F, 0), jnp.flip(c, 0), jnp.flip(Q, 0)
    for r in range(D):
        for cc in range(D):
            comp = F[:, r, cc]
            ident = jnp.asarray(1.0 if r == cc else 0.0, dtype)
            rows.append(jnp.concatenate([ident[None], comp[:-1]]))
    for i in range(D):
        rows.append(jnp.concatenate([jnp.zeros((1,), dtype), c[:-1, i]]))
    for r in range(D):
        for cc in range(D):
            rows.append(jnp.concatenate([jnp.zeros((1,), dtype), Q[:-1, r, cc]]))
    return jnp.stack(rows)  # (KT, N)


def _marginals_pallas_supported(model) -> bool:
    # The affine pipeline needs no matrix inversion, so the only gate is the
    # lane-major component layout staying sane (D*D rows): the Matern dims.
    return model.latent_dim <= 3


def latent_marginal_comps_pallas(model, *, n_blocks=None):
    """Latent marginals in component-major (SD, N) form via the affine
    Pallas pipeline; iteration order already un-flipped to model order."""
    from . import pallas_kernels as pk

    D = model.latent_dim
    SD = D + D * D
    KT = 2 * D * D + D
    N = len(model)
    x0 = model.trans.x0
    dtype = x0.dtype

    params = _affine_comps_iteration(model)  # (KT, N)
    B = min(n_blocks or _pallas_blocks(N), N)
    b_tile, Lc, L = pk._state_plan(N, B, rows=KT + SD)
    n_pad = B * L - N
    if n_pad:
        ident_col = jnp.zeros((KT,), dtype).at[
            jnp.arange(D) * (D + 1)
        ].set(1.0)
        pad = jnp.broadcast_to(ident_col[:, None], (KT, n_pad))
        params = jnp.concatenate([params, pad], axis=1)
    params3 = jnp.swapaxes(params.reshape(KT, B, L), 1, 2)  # (KT, L, B)

    agg = pk.affine_phase1(params3, D, plan=(b_tile, Lc))
    starts = pk.affine_phase2_starts(
        agg, x0.mean, psd.symmetrize(x0.cov), D
    )
    st = pk.affine_phase3_states(params3, starts, D, plan=(b_tile, Lc))
    comps = jnp.reshape(jnp.swapaxes(st, 1, 2), (SD, B * L))[:, :N]
    if not model.trans.forward:
        comps = jnp.flip(comps, axis=1)
    return comps


def latent_marginals_pallas(model, *, n_blocks=None) -> Gaussian:
    from . import lanes

    D = model.latent_dim
    comps = latent_marginal_comps_pallas(model, n_blocks=n_blocks)
    m, P = _comps_to_mats(comps, D)
    return Gaussian(lanes.vec_to_array(m), lanes.mat_to_array(P))


def marginals_diag_pallas(model, *, n_blocks=None):
    """(means, vars) of the observation-space marginals, fully
    component-major (scalar emissions): the smoothing-prediction hot path."""
    from . import lanes
    from ..utils.fill import is_fill, tmaterialize

    D = model.latent_dim
    e = model.emis
    comps = latent_marginal_comps_pallas(model, n_blocks=n_blocks)
    m, P = _comps_to_mats(comps, D)
    if is_fill(e.H):
        H_c = tuple(e.H.value[i] for i in range(D))
    else:
        H_c = tuple(e.H[:, i] for i in range(D))
    h = e.h.value if is_fill(e.h) else e.h
    s = tmaterialize(e.s)
    mu = lanes.vdot(H_c, m) + h
    var = lanes.vdot(H_c, lanes.mv(P, H_c)) + s
    return mu, var


def posterior(model, y, *, n_blocks=None):
    """Smoother-as-reverse-LGSSM on the blocked schedule: blocked filtering
    states + batched dynamics inversion (same semantics as
    assoc.posterior / the sequential driver)."""
    from ..models.gauss_markov import GaussMarkov
    from ..models.lgssm import LGSSM, _invert_dynamics

    if not _supports(model):
        return assoc.posterior(model, y)
    if _pallas_supported(model) and jax.default_backend() == "tpu":
        return _posterior_pallas(model, y, n_blocks)
    xf = filter_(model, y, n_blocks=n_blocks)  # iteration order (forward)
    x0 = model.trans.x0
    prev = Gaussian(
        jnp.concatenate([x0.mean[None].astype(xf.mean.dtype), xf.mean[:-1]]),
        jnp.concatenate(
            [psd.symmetrize(x0.cov)[None].astype(xf.cov.dtype), xf.cov[:-1]]
        ),
    )
    from ..utils.fill import tmaterialize

    F = tmaterialize(model.trans.As)
    c = tmaterialize(model.trans.offs)
    Q = tmaterialize(model.trans.Qs)
    xp = assoc._batched_predict(prev, F, c, Q)
    new_dyn = jax.vmap(_invert_dynamics)(prev, xp, F)
    x_last = Gaussian(xf.mean[-1], xf.cov[-1])
    new_trans = GaussMarkov(
        As=new_dyn[0], offs=new_dyn[1], Qs=new_dyn[2], x0=x_last,
        forward=not model.trans.forward,
    )
    return LGSSM(new_trans, model.emis)


def filter_(model, y, *, n_blocks=None, phase2=None):
    if not _supports(model):
        return assoc.filter_(model, y)
    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    N = len(model)
    B = min(n_blocks or _default_blocks(N, D), N)
    # Padded alignment (missing pseudo-observations do not perturb the
    # filtering states of real steps), then slice back to N.
    params_p, y_p, _s_p, n_pad, _comp = _pad_tail(model, y, B)
    L = (N + n_pad) // B
    blocked = _split_tree((params_p, y_p), B, L)

    if _lanes_supported(model):
        agg = _phase1_aggregates_lanes(blocked, B, D, dtype)
    else:
        agg = _phase1_aggregates(blocked, B, D, dtype)
    prior = _prior_element(x0, D, dtype)
    elems = tuple(jnp.concatenate([p, a], axis=0) for p, a in zip(prior, agg))
    pref = _phase2_prefix(elems, phase2)
    starts = Gaussian(pref[1], pref[2])

    def phase3_step(x, sl):
        ((A, a, Q), e), yt = sl
        xp = lgc.predict(x, A, a, Q)
        xf, _ = em.step_posterior_and_lml(xp, e, yt)
        return xf, xf

    init = Gaussian(starts.mean[:-1], starts.cov[:-1])
    xs_blocked, _ = scan_emit(phase3_step, blocked, init)  # (L, B, ...)
    mean = jnp.swapaxes(xs_blocked.mean, 0, 1).reshape((B * L, D))[:N]
    cov = jnp.swapaxes(xs_blocked.cov, 0, 1).reshape((B * L, D, D))[:N]
    return Gaussian(mean, cov)
