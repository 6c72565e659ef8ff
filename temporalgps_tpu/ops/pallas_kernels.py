"""Pallas TPU kernels for the block-parallel Kalman filter hot loops.

The XLA block engine's cost at large N is per-scan-iteration dispatch
(~10-15us per step on a tunneled v5e); these kernels run the entire
within-block loop *inside one kernel*, so the per-step cost drops to the
hardware-loop cost of a few dozen fused VPU ops.

Layout: the block-batch B lives in the lane dimension. Small matrices are
unrolled into per-component (B_TILE,) vectors (see ops/lanes.py for the
rationale); element/state outputs are component-major (K, B) arrays.

Scope: time-invariant (Fill) transition/emission projections, scalar
emissions with *streamed* per-step noise (covers heteroscedastic noise and
the missing-data large-variance fill), D <= 3 — the flagship Matern
time-series configuration (reference workload: bench/single_output_gps.jl).
The XLA engines remain the general path; gradients route through the XLA
implementation via custom_vjp in ops/block.py (forward = Pallas, backward =
XLA autodiff). On non-TPU backends the kernels run in interpret mode (tests).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lanes

# params vector layout (packed (PK,) array):  A (D*D), a (D), Q (D*D), H (D), h
#   PK = 2*D*D + 2*D + 1


def _unpack_params(p_ref, D):
    i = 0

    def take(n):
        nonlocal i
        vals = [p_ref[0, i + k] for k in range(n)]
        i += n
        return vals

    A_flat = take(D * D)
    a = tuple(take(D))
    Q_flat = take(D * D)
    H = tuple(take(D))
    (h,) = take(1)
    A = tuple(tuple(A_flat[r * D + c] for c in range(D)) for r in range(D))
    Q = tuple(tuple(Q_flat[r * D + c] for c in range(D)) for r in range(D))
    return A, a, Q, H, h


def pack_params(A, a, Q, H, h, dtype):
    return jnp.concatenate(
        [
            jnp.ravel(A).astype(dtype),
            jnp.ravel(a).astype(dtype),
            jnp.ravel(Q).astype(dtype),
            jnp.ravel(H).astype(dtype),
            jnp.reshape(h, (1,)).astype(dtype),
        ]
    )


def _flatten_elem(e, D):
    A_e, b_e, C_e, eta_e, J_e = e
    out = []
    for r in range(D):
        out.extend(A_e[r])
    out.extend(b_e)
    for r in range(D):
        out.extend(C_e[r])
    out.extend(eta_e)
    for r in range(D):
        out.extend(J_e[r])
    return out


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _i32(v):
    return jnp.asarray(v, jnp.int32)


_UNROLL_MAX = 32  # unroll short within-block loops; fori_loop beyond


def _auto_b_tile(L: int, B: int, requested: int) -> int:
    """Cap the lane tile so the double-buffered (L, b_tile) stream blocks fit
    VMEM (~16MB/core): keep L * b_tile <= 2^18 elements per stream."""
    budget = max(128, 1 << max(7, 18 - max(L - 1, 1).bit_length()))
    b = min(requested, budget, B)
    # largest power of two dividing/leq B
    t = 1
    while t * 2 <= b and B % (t * 2) == 0:
        t *= 2
    return t


def _loop(L, body, carry):
    """Unrolled for short L; lax.fori_loop (i32 indices) for long L."""
    if L <= _UNROLL_MAX:
        for l in range(L):
            carry = body(_i32(l), carry)
        return carry
    import numpy as _np

    # i32 bounds -> i32 loop variable (no in-body conversion; Mosaic rejects
    # i64 indices under x64).
    return jax.lax.fori_loop(_np.int32(0), _np.int32(L), body, carry)


def _im_const(i):
    # Index maps must return i32 under jax_enable_x64: Mosaic fails to
    # legalize i64 index-map returns ("func.return (i64, i64)").
    return (_i32(0), _i32(0))


def _im_lane(i):
    return (_i32(0), _i32(i))


# ---------------------------------------------------------------------------
# L-chunked streaming grid
# ---------------------------------------------------------------------------
#
# Phases 1 and 3 stream (L, b_tile) observation blocks through VMEM. For a
# small fused-phase-2 block count B, L = N/B can be arbitrarily long, so the
# stream is chunked along L with a second (fastest, sequential) grid axis and
# the recursion carry held in VMEM scratch across chunks — the standard TPU
# Pallas accumulation pattern. Callers pad N so the chunk length divides L
# (pad steps are LARGE_VAR pseudo-observations whose lml is compensated as a
# constant, exactly like the tail padding, ops/block._pad_tail).


def stream_plan(N: int, B: int, requested_b: int = 4096, rows: int = 2):
    """(b_tile, Lc, L): lane tile, VMEM chunk length, padded per-block
    length (a multiple of Lc) for a blocked stream of N steps over B blocks.
    `rows` is the total per-step component rows streamed in + out; the plan
    keeps rows * Lc * b_tile <= 2^19 elements (~4MB double-buffered f32)."""
    b = 1
    while b * 2 <= min(requested_b, B) and B % (b * 2) == 0:
        b *= 2
    # Mosaic requires the second-to-last block dim be a multiple of 8 (or the
    # full array dim) — keep Lc sublane-aligned.
    Lc = max(8, ((1 << 19) // (rows * b)) & ~7)
    L_raw = -(-N // B)
    if L_raw <= Lc:
        return b, L_raw, L_raw
    L = -(-L_raw // Lc) * Lc
    return b, Lc, L


def _im_stream(i, l):
    return (_i32(l), _i32(i))


def _im_lane2(i, l):
    return (_i32(0), _i32(i))


def _im_const2(i, l):
    return (_i32(0), _i32(0))


def _identity_comps(D, B_TILE, dtype):
    ones = jnp.ones((B_TILE,), dtype)
    zeros = jnp.zeros((B_TILE,), dtype)
    return (
        lanes.eye(D, ones, zeros),
        (zeros,) * D,
        tuple(tuple(zeros for _ in range(D)) for _ in range(D)),
        (zeros,) * D,
        tuple(tuple(zeros for _ in range(D)) for _ in range(D)),
    )


def _read_elem_rows(ref, D, base=0):
    DD = D * D
    row = lambda k: ref[base + k, :]
    A = tuple(tuple(row(r * D + c) for c in range(D)) for r in range(D))
    b = tuple(row(DD + i) for i in range(D))
    C = tuple(tuple(row(DD + D + r * D + c) for c in range(D)) for r in range(D))
    eta = tuple(row(2 * DD + D + i) for i in range(D))
    J = tuple(
        tuple(row(2 * DD + 2 * D + r * D + c) for c in range(D)) for r in range(D)
    )
    return (A, b, C, eta, J)


def _write_elem_rows(ref, e, D, base=0):
    for k, c in enumerate(_flatten_elem(e, D)):
        ref[base + k, :] = c


# ---------------------------------------------------------------------------
# Phase 1: within-block element aggregation
# ---------------------------------------------------------------------------

def _phase1_kernel(p_ref, y_ref, s_ref, out_ref, carry_ref, *, D, Lc, n_l):
    A, a, Q, H, h = _unpack_params(p_ref, D)
    B_TILE = y_ref.shape[1]
    dtype = y_ref.dtype
    l_id = pl.program_id(1)

    @pl.when(l_id == 0)
    def _():
        _write_elem_rows(carry_ref, _identity_comps(D, B_TILE, dtype), D)

    carry = _read_elem_rows(carry_ref, D)

    def body(l, c):
        e = lanes.step_element(A, a, Q, H, h, s_ref[l, :], y_ref[l, :], 1.0, 0.0)
        return lanes.combine(c, e)

    carry = _loop(Lc, body, carry)
    _write_elem_rows(carry_ref, carry, D)

    @pl.when(l_id == n_l - 1)
    def _():
        _write_elem_rows(out_ref, carry, D)


def phase1_aggregate(y_blocked, s_blocked, packed_params, D, *, b_tile=4096,
                     plan=None):
    """(L, B) y and noise -> element components (K, B), K = 3*D*D + 2*D.
    L must be the stream_plan-padded length (a multiple of the chunk); pass
    `plan=(b_tile, Lc)` to share a pipeline-wide blocking."""
    L, B = y_blocked.shape
    K = 3 * D * D + 2 * D
    if plan is None:
        b_tile, Lc, L_plan = stream_plan(B * L, B, b_tile)
        assert L == L_plan, (L, L_plan)
    else:
        b_tile, Lc = plan
    assert L % Lc == 0 and B % b_tile == 0, (L, Lc, B, b_tile)
    n_l = L // Lc
    packed_params = packed_params.reshape(1, -1)
    PK = packed_params.shape[1]
    kernel = functools.partial(_phase1_kernel, D=D, Lc=Lc, n_l=n_l)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, B), y_blocked.dtype),
        grid=(B // b_tile, n_l),
        in_specs=[
            pl.BlockSpec((1, PK), _im_const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((Lc, b_tile), _im_stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lc, b_tile), _im_stream, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, b_tile), _im_lane2, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, b_tile), y_blocked.dtype)],
        interpret=_interpret(),
    )(packed_params, y_blocked, s_blocked)


# ---------------------------------------------------------------------------
# Phase 2: cross-block prefix combine, single kernel
# ---------------------------------------------------------------------------
#
# The XLA `associative_scan` over B block aggregates costs ~log2(B) dispatch
# levels of tiny (B, 3, 3) ops — measured 3-5 ms of the N=1M headline
# (examples/phase_probe.py), i.e. the dominant term. This kernel runs the
# whole inclusive Kogge-Stone prefix in VMEM: components live as (1, B) lane
# vectors, each level is a static-slice shift + one lane-major combine, and
# the B-element scan costs one dispatch.


def _read_elem(ref, D):
    """Element tuple of (1, B) lane vectors from a (K, B) component ref."""
    DD = D * D
    row = lambda k: ref[k : k + 1, :]
    A = tuple(tuple(row(r * D + c) for c in range(D)) for r in range(D))
    b = tuple(row(DD + i) for i in range(D))
    C = tuple(tuple(row(DD + D + r * D + c) for c in range(D)) for r in range(D))
    eta = tuple(row(2 * DD + D + i) for i in range(D))
    J = tuple(
        tuple(row(2 * DD + 2 * D + r * D + c) for c in range(D)) for r in range(D)
    )
    return (A, b, C, eta, J)


def _shift_elem(e, s, B, dtype):
    """Shift every lane vector right by s, filling the first s lanes with the
    identity element (A=I, rest 0)."""

    def shift(comp, idv):
        fill = jnp.full((1, s), idv, dtype)
        return jnp.concatenate([fill, comp[:, : B - s]], axis=1)

    A, b, C, eta, J = e
    D = len(b)
    A_s = tuple(
        tuple(shift(A[r][c], 1.0 if r == c else 0.0) for c in range(D))
        for r in range(D)
    )
    zs = lambda t: tuple(shift(x, 0.0) for x in t)
    zm = lambda M: tuple(tuple(shift(M[r][c], 0.0) for c in range(D)) for r in range(D))
    return (A_s, zs(b), zm(C), zs(eta), zm(J))


def _phase2_kernel(prior_ref, comps_ref, out_ref, *, D, B):
    dtype = comps_ref.dtype
    DD = D * D
    e = _read_elem(comps_ref, D)

    # Inclusive Kogge-Stone prefix: e[b] := agg_0 ∘ ... ∘ agg_b.
    s = 1
    while s < B:
        e = lanes.combine(_shift_elem(e, s, B, dtype), e)
        s *= 2
    # Exclusive prefix, then seed with the prior element (0, m0, P0, 0, 0):
    # starts[b] = prior ∘ agg_0 ∘ ... ∘ agg_{b-1}.
    e = _shift_elem(e, 1, B, dtype)
    m0 = tuple(prior_ref[0, i] for i in range(D))
    P0 = tuple(tuple(prior_ref[0, D + r * D + c] for c in range(D)) for r in range(D))
    zero, one = jnp.zeros((), dtype), jnp.ones((), dtype)
    prior = (
        tuple(tuple(zero for _ in range(D)) for _ in range(D)),
        m0,
        P0,
        tuple(zero for _ in range(D)),
        tuple(tuple(zero for _ in range(D)) for _ in range(D)),
    )
    _, b, C, _, _ = lanes.combine(prior, e)
    for i in range(D):
        out_ref[i, :] = b[i][0, :]
    for r in range(D):
        for c in range(D):
            out_ref[D + r * D + c, :] = C[r][c][0, :]


def phase2_starts(comps, x0_mean, x0_cov, D):
    """(K, B) phase-1 aggregates -> (D + D*D, B) block-start filtering states
    (mean rows then row-major covariance rows), entirely in one kernel."""
    K, B = comps.shape
    SD = D + D * D
    dtype = comps.dtype
    prior = jnp.concatenate(
        [jnp.ravel(x0_mean).astype(dtype), jnp.ravel(x0_cov).astype(dtype)]
    ).reshape(1, SD)
    kernel = functools.partial(_phase2_kernel, D=D, B=B)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SD, B), dtype),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, SD), _im_const, memory_space=pltpu.SMEM),
            pl.BlockSpec((K, B), _im_const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SD, B), _im_const, memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(prior, comps)


# ---------------------------------------------------------------------------
# Forward-mode (JVP) phase kernels: primal + k tangents in one pass
# ---------------------------------------------------------------------------
#
# The learning workload differentiates logpdf w.r.t. a handful of
# hyperparameters. Reverse mode stores/replays scan residuals; forward mode
# through the XLA block engine re-pays its dispatch overhead once per
# tangent (measured 33 ms for k=3 at N=1M vs 5 ms primal). These kernels
# carry the primal and k tangent recursions together through the fused
# phases: every step is linearised IN-KERNEL with `jax.linearize` (a
# trace-time transform — Mosaic sees only ordinary VPU ops), so the primal
# is computed once and each tangent replays only the linear part.
#
# Tangent conventions: observations y carry no tangent (fixed data);
# the streamed noise s is a time-invariant Fill whose tangent is
# ds * mask, mask = (s < LARGE_VAR/2) — exactly zero at missing-data /
# alignment-padding steps (their s is the LARGE_VAR fill and their lml
# contribution is a constant). Packed layout = pack_params plus one
# trailing slot for s/ds.


def pack_params_s(A, a, Q, H, h, s, dtype):
    return jnp.concatenate(
        [pack_params(A, a, Q, H, h, dtype), jnp.reshape(s, (1,)).astype(dtype)]
    )


_MASK_THRESH = 1e14  # LARGE_VAR / 10: streamed s above this = padded/missing


def _unpack_rows(p_ref, D, k):
    """Primal + k tangent parameter tuples from a (1+k, PK2) SMEM ref.
    Returns list of (A, a, Q, H, h, s_slot) nested-scalar tuples."""
    rows = []
    for j in range(1 + k):
        i = 0

        def take(n, j=j):
            nonlocal i
            vals = [p_ref[j, i + t] for t in range(n)]
            i += n
            return vals

        A_flat = take(D * D)
        a = tuple(take(D))
        Q_flat = take(D * D)
        H = tuple(take(D))
        (h,) = take(1)
        (s,) = take(1)
        A = tuple(tuple(A_flat[r * D + c] for c in range(D)) for r in range(D))
        Q = tuple(tuple(Q_flat[r * D + c] for c in range(D)) for r in range(D))
        rows.append((A, a, Q, H, h, s))
    return rows


def _zeros_like_tree(t):
    return jax.tree_util.tree_map(jnp.zeros_like, t)


def _phase1_jvp_kernel(p_ref, y_ref, s_ref, out_ref, carry_ref, *, D, Lc,
                       n_l, k):
    rows = _unpack_rows(p_ref, D, k)
    A, a, Q, H, h, _s = rows[0]
    B_TILE = y_ref.shape[1]
    dtype = y_ref.dtype
    ones = jnp.ones((B_TILE,), dtype)
    zeros = jnp.zeros((B_TILE,), dtype)
    K = 3 * D * D + 2 * D
    l_id = pl.program_id(1)

    @pl.when(l_id == 0)
    def _():
        ident = _identity_comps(D, B_TILE, dtype)
        _write_elem_rows(carry_ref, ident, D, base=0)
        for j in range(k):
            _write_elem_rows(
                carry_ref, _zeros_like_tree(ident), D, base=(1 + j) * K
            )

    carry = (
        _read_elem_rows(carry_ref, D, base=0),
        tuple(_read_elem_rows(carry_ref, D, base=(1 + j) * K) for j in range(k)),
    )

    def body(l, c):
        prim, tans = c
        s_l = s_ref[l, :]
        y_l = y_ref[l, :]
        mask = jnp.where(s_l < _MASK_THRESH, ones, zeros)

        def step_fn(A_, a_, Q_, H_, h_, s_):
            return lanes.step_element(A_, a_, Q_, H_, h_, s_, y_l, 1.0, 0.0)

        e, lin_e = jax.linearize(step_fn, A, a, Q, H, h, s_l)
        prim_new, lin_c = jax.linearize(lanes.combine, prim, e)
        tans_new = []
        for j in range(k):
            dA, da, dQ, dH, dh, ds = rows[1 + j]
            de = lin_e(dA, da, dQ, dH, dh, ds * mask)
            tans_new.append(lin_c(tans[j], de))
        return (prim_new, tuple(tans_new))

    prim, tans = _loop(Lc, body, carry)
    _write_elem_rows(carry_ref, prim, D, base=0)
    for j in range(k):
        _write_elem_rows(carry_ref, tans[j], D, base=(1 + j) * K)

    @pl.when(l_id == n_l - 1)
    def _():
        for j, e in enumerate((prim,) + tuple(tans)):
            _write_elem_rows(out_ref, e, D, base=j * K)


def phase1_jvp(y_blocked, s_blocked, packed_rows, D, k, *, b_tile=4096):
    """(L, B) streams + (1+k, PK2) packed params -> ((1+k)*K, B) element
    components (primal block aggregates followed by k tangent sets)."""
    L, B = y_blocked.shape
    K = 3 * D * D + 2 * D
    b_tile, Lc, L_plan = stream_plan(B * L, B, b_tile)
    assert L == L_plan and L % Lc == 0, (L, L_plan, Lc)
    n_l = L // Lc
    PK2 = packed_rows.shape[-1]
    kernel = functools.partial(_phase1_jvp_kernel, D=D, Lc=Lc, n_l=n_l, k=k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(((1 + k) * K, B), y_blocked.dtype),
        grid=(B // b_tile, n_l),
        in_specs=[
            pl.BlockSpec((1 + k, PK2), _im_const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((Lc, b_tile), _im_stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lc, b_tile), _im_stream, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            ((1 + k) * K, b_tile), _im_lane2, memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM(((1 + k) * K, b_tile), y_blocked.dtype)],
        interpret=_interpret(),
    )(packed_rows, y_blocked, s_blocked)


def _phase2_jvp_kernel(prior_ref, comps_ref, out_ref, *, D, B, k):
    dtype = comps_ref.dtype
    K = 3 * D * D + 2 * D
    DD = D * D

    def read_elem(base):
        row = lambda kk: comps_ref[base + kk : base + kk + 1, :]
        A = tuple(tuple(row(r * D + c) for c in range(D)) for r in range(D))
        b = tuple(row(DD + i) for i in range(D))
        C = tuple(tuple(row(DD + D + r * D + c) for c in range(D)) for r in range(D))
        eta = tuple(row(2 * DD + D + i) for i in range(D))
        J = tuple(
            tuple(row(2 * DD + 2 * D + r * D + c) for c in range(D))
            for r in range(D)
        )
        return (A, b, C, eta, J)

    prim = read_elem(0)
    tans = [read_elem((1 + j) * K) for j in range(k)]

    def shift_zero(e, s):
        def sh(comp):
            return jnp.concatenate(
                [jnp.zeros((1, s), dtype), comp[:, : B - s]], axis=1
            )

        return jax.tree_util.tree_map(sh, e)

    s = 1
    while s < B:
        sh_prim = _shift_elem(prim, s, B, dtype)
        prim_new, lin = jax.linearize(lanes.combine, sh_prim, prim)
        tans = [lin(shift_zero(t, s), t) for t in tans]
        prim = prim_new
        s *= 2

    prim = _shift_elem(prim, 1, B, dtype)
    tans = [shift_zero(t, 1) for t in tans]

    zero, one = jnp.zeros((), dtype), jnp.ones((), dtype)

    def prior_elem(j):
        m0 = tuple(prior_ref[j, i] for i in range(D))
        P0 = tuple(
            tuple(prior_ref[j, D + r * D + c] for c in range(D)) for r in range(D)
        )
        return (
            tuple(tuple(zero for _ in range(D)) for _ in range(D)),
            m0,
            P0,
            tuple(zero for _ in range(D)),
            tuple(tuple(zero for _ in range(D)) for _ in range(D)),
        )

    prim_new, lin = jax.linearize(lanes.combine, prior_elem(0), prim)
    outs = [prim_new] + [lin(prior_elem(1 + j), t) for j, t in enumerate(tans)]
    SD = D + DD
    for j, (_, b, C, _, _) in enumerate(outs):
        for i in range(D):
            out_ref[j * SD + i, :] = b[i][0, :]
        for r in range(D):
            for c in range(D):
                out_ref[j * SD + D + r * D + c, :] = C[r][c][0, :]


def phase2_jvp_starts(comps, priors, D, k):
    """((1+k)*K, B) aggregates + (1+k, SD) priors (m0 rows then P0 rows, per
    primal/tangent) -> ((1+k)*SD, B) block-start states."""
    _, B = comps.shape
    SD = D + D * D
    dtype = comps.dtype
    kernel = functools.partial(_phase2_jvp_kernel, D=D, B=B, k=k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(((1 + k) * SD, B), dtype),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1 + k, SD), _im_const, memory_space=pltpu.SMEM),
            pl.BlockSpec(comps.shape, _im_const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(((1 + k) * SD, B), _im_const, memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(priors, comps)


def _phase3_jvp_kernel(p_ref, y_ref, s_ref, start_ref, lml_ref, carry_ref, *,
                       D, Lc, n_l, k):
    rows = _unpack_rows(p_ref, D, k)
    A, a, Q, H, h, _s = rows[0]
    B_TILE = y_ref.shape[1]
    dtype = y_ref.dtype
    ones = jnp.ones((B_TILE,), dtype)
    zeros = jnp.zeros((B_TILE,), dtype)
    SD = D + D * D
    SA = SD + 1  # per-set carry rows: state + lml accumulator
    l_id = pl.program_id(1)

    @pl.when(l_id == 0)
    def _():
        for j in range(1 + k):
            m0, P0 = _read_state_rows(start_ref, D, base=j * SD)
            _write_state_rows(carry_ref, m0, P0, D, base=j * SA)
            carry_ref[j * SA + SD, :] = zeros

    def read_carry(j):
        m, P = _read_state_rows(carry_ref, D, base=j * SA)
        return (m, P, carry_ref[j * SA + SD, :])

    carry = (read_carry(0), tuple(read_carry(1 + j) for j in range(k)))

    def body(l, c):
        (m, P, acc), tans = c
        s_l = s_ref[l, :]
        y_l = y_ref[l, :]
        mask = jnp.where(s_l < _MASK_THRESH, ones, zeros)

        def step_fn(m_, P_, A_, a_, Q_, H_, h_, s_):
            return lanes.kalman_step(m_, P_, A_, a_, Q_, H_, h_, s_, y_l)

        (m_new, P_new, lml), lin = jax.linearize(step_fn, m, P, A, a, Q, H, h, s_l)
        new_tans = []
        for j in range(k):
            dm, dP, dacc = tans[j]
            dA, da, dQ, dH, dh, ds = rows[1 + j]
            dm_new, dP_new, dlml = lin(dm, dP, dA, da, dQ, dH, dh, ds * mask)
            new_tans.append((dm_new, dP_new, dacc + dlml))
        return ((m_new, P_new, acc + lml), tuple(new_tans))

    (m, P, acc), tans = _loop(Lc, body, carry)
    _write_state_rows(carry_ref, m, P, D, base=0)
    carry_ref[SD, :] = acc
    for j in range(k):
        dm, dP, dacc = tans[j]
        _write_state_rows(carry_ref, dm, dP, D, base=(1 + j) * SA)
        carry_ref[(1 + j) * SA + SD, :] = dacc

    @pl.when(l_id == n_l - 1)
    def _():
        lml_ref[0, :] = acc
        for j in range(k):
            lml_ref[1 + j, :] = tans[j][2]


def phase3_jvp_lml(y_blocked, s_blocked, packed_rows, starts, D, k, *, b_tile=4096):
    """-> (1+k, B) per-block lml sums (primal row then k tangent rows)."""
    L, B = y_blocked.shape
    b_tile, Lc, L_plan = stream_plan(B * L, B, b_tile)
    assert L == L_plan and L % Lc == 0, (L, L_plan, Lc)
    n_l = L // Lc
    PK2 = packed_rows.shape[-1]
    SD = D + D * D
    kernel = functools.partial(_phase3_jvp_kernel, D=D, Lc=Lc, n_l=n_l, k=k)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1 + k, B), y_blocked.dtype),
        grid=(B // b_tile, n_l),
        in_specs=[
            pl.BlockSpec((1 + k, PK2), _im_const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((Lc, b_tile), _im_stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lc, b_tile), _im_stream, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                ((1 + k) * SD, b_tile), _im_lane2, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1 + k, b_tile), _im_lane2, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(((1 + k) * (SD + 1), b_tile), y_blocked.dtype)
        ],
        interpret=_interpret(),
    )(packed_rows, y_blocked, s_blocked, starts)


# ---------------------------------------------------------------------------
# Phase 3: within-block Kalman recursion with lml accumulation
# ---------------------------------------------------------------------------

def _read_state_rows(ref, D, base=0):
    m = tuple(ref[base + i, :] for i in range(D))
    P = tuple(
        tuple(ref[base + D + r * D + c, :] for c in range(D)) for r in range(D)
    )
    return m, P


def _write_state_rows(ref, m, P, D, base=0):
    for i in range(D):
        ref[base + i, :] = m[i]
    for r in range(D):
        for c in range(D):
            ref[base + D + r * D + c, :] = P[r][c]


def _phase3_kernel(p_ref, y_ref, s_ref, start_ref, lml_ref, carry_ref, *, D,
                   Lc, n_l):
    A, a, Q, H, h = _unpack_params(p_ref, D)
    B_TILE = y_ref.shape[1]
    dtype = y_ref.dtype
    SD = D + D * D
    l_id = pl.program_id(1)
    log2pi = math.log(2.0 * math.pi)

    @pl.when(l_id == 0)
    def _():
        m0, P0 = _read_state_rows(start_ref, D)
        _write_state_rows(carry_ref, m0, P0, D)
        carry_ref[SD, :] = jnp.zeros((B_TILE,), dtype)

    m, P = _read_state_rows(carry_ref, D)
    acc = carry_ref[SD, :]

    def body(l, carry):
        m, P, acc = carry
        y_l = y_ref[l, :]
        mp = lanes.vadd(lanes.mv(A, m), a)
        Pp = lanes.madd(lanes.sym(lanes.mmT(lanes.mm(A, P), A)), Q)
        V = lanes.mv(Pp, H)
        S = lanes.vdot(H, V) + s_ref[l, :]
        resid = y_l - (lanes.vdot(H, mp) + h)
        acc = acc - 0.5 * (log2pi + jnp.log(S) + resid * resid / S)
        Kg = lanes.vscale(1.0 / S, V)
        m = lanes.vadd(mp, lanes.vscale(resid, Kg))
        P = lanes.sym(lanes.msub(Pp, lanes.outer(Kg, V)))
        return (m, P, acc)

    m, P, acc = _loop(Lc, body, (m, P, acc))
    _write_state_rows(carry_ref, m, P, D)
    carry_ref[SD, :] = acc

    @pl.when(l_id == n_l - 1)
    def _():
        lml_ref[0, :] = acc


def phase3_lml(y_blocked, s_blocked, packed_params, starts, D, *, b_tile=4096):
    """starts: (D + D*D, B) component-major block-start states -> (B,) lmls."""
    L, B = y_blocked.shape
    b_tile, Lc, L_plan = stream_plan(B * L, B, b_tile)
    assert L == L_plan and L % Lc == 0, (L, L_plan, Lc)
    n_l = L // Lc
    packed_params = packed_params.reshape(1, -1)
    PK = packed_params.shape[1]
    SD = D + D * D
    kernel = functools.partial(_phase3_kernel, D=D, Lc=Lc, n_l=n_l)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, B), y_blocked.dtype),
        grid=(B // b_tile, n_l),
        in_specs=[
            pl.BlockSpec((1, PK), _im_const2, memory_space=pltpu.SMEM),
            pl.BlockSpec((Lc, b_tile), _im_stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lc, b_tile), _im_stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((SD, b_tile), _im_lane2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b_tile), _im_lane2, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SD + 1, b_tile), y_blocked.dtype)],
        interpret=_interpret(),
    )(packed_params, y_blocked, s_blocked, starts)
    return out[0]


# ---------------------------------------------------------------------------
# Component-major posterior pipeline kernels
# ---------------------------------------------------------------------------
#
# The smoothing-marginals workload (posterior + marginals_diag) is a chain
# of per-step maps with no XLA-friendly (N, D, D) layout: XLA pads the
# trailing (D, D) of small-D arrays to (8, 128) tiles, and the phase scans
# re-pay dispatch. These kernels keep EVERYTHING component-major:
#
#   states  (SD, N)  rows = D mean comps + D*D covariance comps
#   affine  (KT, N)  rows = D*D A comps + D offset comps + D*D noise comps
#
# and run the three pipelines entirely in-kernel:
#   phase3_states       filter states at every step (Fill params, streamed y/s)
#   affine_phase1/2/3   prefix composition of time-varying affine-Gaussian
#                       maps (the smoothing pass of a constructed posterior,
#                       and prior marginals) — same 3-phase schedule as the
#                       filter, affine combine needs no inversion.
#
# State/affine blocks stream as (rows, Lc, b_tile) with the step axis in the
# middle so per-step slabs are lane-contiguous.


def _state_plan(N, B, rows):
    return stream_plan(N, B, requested_b=1024, rows=rows)


def _phase3_states_kernel(p_ref, y_ref, s_ref, start_ref, out_ref, carry_ref,
                          *, D, Lc, n_l):
    A, a, Q, H, h = _unpack_params(p_ref, D)
    l_id = pl.program_id(1)

    @pl.when(l_id == 0)
    def _():
        m0, P0 = _read_state_rows(start_ref, D)
        _write_state_rows(carry_ref, m0, P0, D)

    m, P = _read_state_rows(carry_ref, D)

    for l in range(Lc):
        m, P, _lml = lanes.kalman_step(
            m, P, A, a, Q, H, h, s_ref[l, :], y_ref[l, :]
        )
        for i in range(D):
            out_ref[i, l, :] = m[i]
        for r in range(D):
            for c in range(D):
                out_ref[D + r * D + c, l, :] = P[r][c]

    _write_state_rows(carry_ref, m, P, D)


def phase3_states(y_blocked, s_blocked, packed_params, starts, D, *, plan=None):
    """Filtering state at EVERY step, component-major: (SD, L, B) with
    out[:, l, b] the state after step b*L + l."""
    L, B = y_blocked.shape
    SD = D + D * D
    if plan is None:
        b_tile, Lc, L_plan = _state_plan(B * L, B, rows=2 + SD)
        assert L == L_plan, (L, L_plan)
    else:
        b_tile, Lc = plan
    assert L % Lc == 0 and B % b_tile == 0, (L, Lc, B, b_tile)
    n_l = L // Lc
    packed_params = packed_params.reshape(1, -1)
    PK = packed_params.shape[1]
    kernel = functools.partial(_phase3_states_kernel, D=D, Lc=Lc, n_l=n_l)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SD, L, B), y_blocked.dtype),
        grid=(B // b_tile, n_l),
        in_specs=[
            pl.BlockSpec((1, PK), lambda i, l: (_i32(0), _i32(0)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Lc, b_tile), _im_stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lc, b_tile), _im_stream, memory_space=pltpu.VMEM),
            pl.BlockSpec((SD, b_tile), _im_lane2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (SD, Lc, b_tile), lambda i, l: (_i32(0), _i32(l), _i32(i)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((SD, b_tile), y_blocked.dtype)],
        interpret=_interpret(),
    )(packed_params, y_blocked, s_blocked, starts)


def _read_affine(ref, D, l):
    DD = D * D
    row = lambda kk: ref[kk, l, :]
    A = tuple(tuple(row(r * D + c) for c in range(D)) for r in range(D))
    b = tuple(row(DD + i) for i in range(D))
    C = tuple(tuple(row(DD + D + r * D + c) for c in range(D)) for r in range(D))
    return A, b, C


def _affine_combine(e_i, e_j):
    A = lanes.mm(e_j[0], e_i[0])
    b = lanes.vadd(lanes.mv(e_j[0], e_i[1]), e_j[1])
    C = lanes.madd(lanes.sym(lanes.mmT(lanes.mm(e_j[0], e_i[2]), e_j[0])), e_j[2])
    return (A, b, C)


def _write_affine_rows(ref, e, D):
    A, b, C = e
    DD = D * D
    for r in range(D):
        for c in range(D):
            ref[r * D + c, :] = A[r][c]
    for i in range(D):
        ref[DD + i, :] = b[i]
    for r in range(D):
        for c in range(D):
            ref[DD + D + r * D + c, :] = C[r][c]


def _read_affine_rows(ref, D):
    DD = D * D
    row = lambda kk: ref[kk, :]
    A = tuple(tuple(row(r * D + c) for c in range(D)) for r in range(D))
    b = tuple(row(DD + i) for i in range(D))
    C = tuple(tuple(row(DD + D + r * D + c) for c in range(D)) for r in range(D))
    return A, b, C


def _affine_phase1_kernel(p_ref, out_ref, carry_ref, *, D, Lc, n_l):
    B_TILE = p_ref.shape[2]
    dtype = p_ref.dtype
    l_id = pl.program_id(1)
    ones = jnp.ones((B_TILE,), dtype)
    zeros = jnp.zeros((B_TILE,), dtype)

    @pl.when(l_id == 0)
    def _():
        zmat = tuple(tuple(zeros for _ in range(D)) for _ in range(D))
        _write_affine_rows(carry_ref, (lanes.eye(D, ones, zeros), (zeros,) * D, zmat), D)

    carry = _read_affine_rows(carry_ref, D)
    for l in range(Lc):
        carry = _affine_combine(carry, _read_affine(p_ref, D, l))
    _write_affine_rows(carry_ref, carry, D)

    @pl.when(l_id == n_l - 1)
    def _():
        _write_affine_rows(out_ref, carry, D)


def affine_phase1(params, D, *, plan=None):
    """params (KT, L, B) time-varying affine maps -> (KT, B) block
    aggregates. KT = 2*D*D + D."""
    KT, L, B = params.shape
    if plan is None:
        b_tile, Lc, L_plan = _state_plan(B * L, B, rows=KT)
        assert L == L_plan, (L, L_plan)
    else:
        b_tile, Lc = plan
    assert L % Lc == 0 and B % b_tile == 0, (L, Lc, B, b_tile)
    n_l = L // Lc
    kernel = functools.partial(_affine_phase1_kernel, D=D, Lc=Lc, n_l=n_l)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((KT, B), params.dtype),
        grid=(B // b_tile, n_l),
        in_specs=[
            pl.BlockSpec((KT, Lc, b_tile), lambda i, l: (_i32(0), _i32(l), _i32(i)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KT, b_tile), _im_lane2, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((KT, b_tile), params.dtype)],
        interpret=_interpret(),
    )(params)


def _affine_phase2_kernel(prior_ref, agg_ref, out_ref, *, D, B):
    dtype = agg_ref.dtype
    DD = D * D

    def read_elem():
        row = lambda kk: agg_ref[kk : kk + 1, :]
        A = tuple(tuple(row(r * D + c) for c in range(D)) for r in range(D))
        b = tuple(row(DD + i) for i in range(D))
        C = tuple(tuple(row(DD + D + r * D + c) for c in range(D)) for r in range(D))
        return (A, b, C)

    def shift(e, s):
        def sh(comp, idv):
            fill = jnp.full((1, s), idv, dtype)
            return jnp.concatenate([fill, comp[:, : B - s]], axis=1)

        A, b, C = e
        A_s = tuple(
            tuple(sh(A[r][c], 1.0 if r == c else 0.0) for c in range(D))
            for r in range(D)
        )
        b_s = tuple(sh(x, 0.0) for x in b)
        C_s = tuple(tuple(sh(C[r][c], 0.0) for c in range(D)) for r in range(D))
        return (A_s, b_s, C_s)

    e = read_elem()
    s = 1
    while s < B:
        e = _affine_combine(shift(e, s), e)
        s *= 2
    e = shift(e, 1)
    zero = jnp.zeros((), dtype)
    m0 = tuple(prior_ref[0, i] for i in range(D))
    P0 = tuple(tuple(prior_ref[0, D + r * D + c] for c in range(D)) for r in range(D))
    prior = (tuple(tuple(zero for _ in range(D)) for _ in range(D)), m0, P0)
    _, b, C = _affine_combine(prior, e)
    for i in range(D):
        out_ref[i, :] = b[i][0, :]
    for r in range(D):
        for c in range(D):
            out_ref[D + r * D + c, :] = C[r][c][0, :]


def affine_phase2_starts(agg, x0_mean, x0_cov, D):
    """(KT, B) aggregates + initial state -> (SD, B) block-start states."""
    KT, B = agg.shape
    SD = D + D * D
    dtype = agg.dtype
    prior = jnp.concatenate(
        [jnp.ravel(x0_mean).astype(dtype), jnp.ravel(x0_cov).astype(dtype)]
    ).reshape(1, SD)
    kernel = functools.partial(_affine_phase2_kernel, D=D, B=B)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SD, B), dtype),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, SD), _im_const, memory_space=pltpu.SMEM),
            pl.BlockSpec((KT, B), _im_const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SD, B), _im_const, memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(prior, agg)


def _affine_phase3_kernel(p_ref, start_ref, out_ref, carry_ref, *, D, Lc, n_l):
    l_id = pl.program_id(1)

    @pl.when(l_id == 0)
    def _():
        m0, P0 = _read_state_rows(start_ref, D)
        _write_state_rows(carry_ref, m0, P0, D)

    m, P = _read_state_rows(carry_ref, D)
    for l in range(Lc):
        A, b, C = _read_affine(p_ref, D, l)
        m = lanes.vadd(lanes.mv(A, m), b)
        P = lanes.madd(lanes.sym(lanes.mmT(lanes.mm(A, P), A)), C)
        for i in range(D):
            out_ref[i, l, :] = m[i]
        for r in range(D):
            for c in range(D):
                out_ref[D + r * D + c, l, :] = P[r][c]
    _write_state_rows(carry_ref, m, P, D)


def affine_phase3_states(params, starts, D, *, plan=None):
    """Replay: states of the affine recursion at every step, (SD, L, B)."""
    KT, L, B = params.shape
    SD = D + D * D
    if plan is None:
        b_tile, Lc, L_plan = _state_plan(B * L, B, rows=KT + SD)
        assert L == L_plan, (L, L_plan)
    else:
        b_tile, Lc = plan
    assert L % Lc == 0 and B % b_tile == 0, (L, Lc, B, b_tile)
    n_l = L // Lc
    kernel = functools.partial(_affine_phase3_kernel, D=D, Lc=Lc, n_l=n_l)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SD, L, B), params.dtype),
        grid=(B // b_tile, n_l),
        in_specs=[
            pl.BlockSpec((KT, Lc, b_tile), lambda i, l: (_i32(0), _i32(l), _i32(i)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SD, b_tile), _im_lane2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (SD, Lc, b_tile), lambda i, l: (_i32(0), _i32(l), _i32(i)),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((SD, b_tile), params.dtype)],
        interpret=_interpret(),
    )(params, starts)
