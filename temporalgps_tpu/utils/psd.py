"""Small positive-semi-definite linear algebra primitives.

TPU-native equivalents of the reference's cholesky/quadratic-form helpers
(reference: src/util/linear_algebra.jl:1-16). All functions are shape-batched:
they operate on the trailing (D, D) / (D,) axes and broadcast over any leading
axes, which is how the per-step math of the filter becomes MXU/VPU-friendly
batched work (contrast with the reference's one-matrix-at-a-time BLAS calls).

For tiny D (the Matern state dims 1/2/3) `jnp.linalg` cholesky/solve lower to
loops that XLA handles poorly on TPU, so we provide closed-form unrolled
choleskys and triangular solves for D <= 4 that are pure VPU element-wise code.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..config import IDENT_EPS


def symmetrize(P):
    """0.5 (P + P^T) on the trailing two axes (reference: util/linear_algebra.jl:1-3)."""
    return 0.5 * (P + jnp.swapaxes(P, -1, -2))


def add_jitter(P, eps=IDENT_EPS):
    D = P.shape[-1]
    return P + eps * jnp.eye(D, dtype=P.dtype)


def dtype_jitter(dtype, f64_eps=IDENT_EPS, f32_eps=1e-5):
    """Jitter magnitude appropriate to the storage dtype: the reference's
    1e-12 constants assume Float64 (src/gp/lti_sde.jl:27-29 etc.); under
    float32 a near-singular spatial gram (e.g. a dense EQ kernel matrix)
    needs ~1e-5 relative regularisation to stay PSD."""
    return f64_eps if jnp.dtype(dtype).itemsize >= 8 else f32_eps


def _chol_unrolled(P, D: int):
    """Closed-form Cholesky for D<=4, elementwise over leading batch axes."""
    idx = lambda i, j: P[..., i, j]
    eps = jnp.asarray(0.0, P.dtype)
    L = [[None] * D for _ in range(D)]
    for j in range(D):
        s = idx(j, j)
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = Ljj
        inv = jnp.where(Ljj > 0, 1.0 / jnp.where(Ljj > 0, Ljj, 1.0), 0.0)
        for i in range(j + 1, D):
            s = idx(i, j)
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    rows = []
    for i in range(D):
        cols = [L[i][j] if j <= i else jnp.zeros_like(idx(0, 0)) for j in range(D)]
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def _chol_unrolled_col(P, D: int):
    """Column-by-column Cholesky with rank-1 downdates, batched — pure
    elementwise/VPU ops. XLA-TPU's cholesky custom lowering for batched
    small matrices is far off speed-of-light (measured v5e, (1e5, 30, 30)
    f32: 359 ms vs 78 ms for this unroll); the (D,) column ops here stay
    lane-dense instead of looping tiny tiles."""
    R = P
    eps = jnp.asarray(0.0, P.dtype)
    cols = []
    ar = jnp.arange(D)
    for j in range(D):
        d = jnp.sqrt(jnp.maximum(R[..., j, j], eps))
        inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
        col = R[..., :, j] * inv[..., None]
        col = jnp.where(ar > j, col, 0.0).at[..., j].set(d)
        cols.append(col)
        if j + 1 < D:
            R = R - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


# Above this state dim the unrolled trace gets large and XLA's blocked
# lowering becomes competitive; below it the unrolls win outright on TPU.
_UNROLL_MAX_D = 48


@jax.custom_jvp
def _chol_mid(P):
    return _chol_unrolled_col(P, P.shape[-1])


@_chol_mid.defjvp
def _chol_mid_jvp(primals, tangents):
    """Standard Cholesky differential dL = L phi(L^{-1} dP L^{-T}) — keeps
    reverse-mode residuals at O(L) instead of the unrolled loop's
    per-column downdate chain (which would store D copies of (N, D, D))."""
    (P,) = primals
    (dP,) = tangents
    L = _chol_unrolled_col(P, P.shape[-1])
    # Symmetrise the tangent: inputs are used as symmetric matrices, so the
    # transposed rule distributes cotangents symmetrically (the library
    # always symmetrises before cholesky).
    dPs = 0.5 * (dP + jnp.swapaxes(dP, -1, -2))
    X = tri_solve(L, jnp.swapaxes(tri_solve(L, dPs), -1, -2))
    Phi = jnp.tril(X, -1) + 0.5 * jnp.tril(jnp.triu(X))
    return L, L @ Phi


# The unrolled mid-D paths only pay off for FAT batches (their many small
# ops are a dispatch/HLO tax in sequential scans — measured: the DTC
# sequential engine regressed 1.9 s -> 9.4 s when they ran per-step).
_UNROLL_MIN_BATCH = 256


# ---------------------------------------------------------------------------
# Compact (lax.scan) mid-D factorisations for latency-mode call sites.
#
# The Python-unrolled mid-D paths emit O(D) primitives per call; the steady/
# lti constant-operator chains contain ~20-25 combines x ~5 solves each, and
# under value_and_grad the resulting graph measured 54k+ HLO ops at the DTC
# test shape — 227 s XLA-CPU compiles, and big enough to OOM-kill the remote
# TPU compile helper at the c5 bench shape. These scan forms emit O(1)
# primitives per call (one tiny loop body) at the cost of a D-iteration
# sequential loop at runtime — irrelevant for the thin constant chains they
# serve, which are latency-bound, not throughput-bound. Custom JVPs keep the
# same compact structure; AD never differentiates through the loop bodies.
# ---------------------------------------------------------------------------


def _chol_scan_impl(P, D: int):
    """Column Cholesky with rank-1 downdates as a lax.scan over columns."""
    ar = jnp.arange(D)

    def step(R, j):
        d = jnp.sqrt(jnp.maximum(jnp.sum(
            jnp.where(ar == j, jnp.diagonal(R, axis1=-2, axis2=-1), 0.0),
            axis=-1), 0.0))
        inv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
        colfull = jnp.sum(jnp.where(ar == j, R, 0.0), axis=-1)  # R[..., :, j]
        col = jnp.where(ar > j, colfull * inv[..., None], 0.0)
        col = jnp.where(ar == j, d[..., None], col)
        R = R - col[..., :, None] * col[..., None, :]
        return R, col

    _, cols = jax.lax.scan(step, P, jnp.arange(D))
    # cols: (D_cols, ..., D) -> (..., D, D_cols)
    return jnp.moveaxis(cols, 0, -1)


@jax.custom_jvp
def _chol_compact(P):
    return _chol_scan_impl(P, P.shape[-1])


@_chol_compact.defjvp
def _chol_compact_jvp(primals, tangents):
    (P,) = primals
    (dP,) = tangents
    L = _chol_scan_impl(P, P.shape[-1])
    dPs = 0.5 * (dP + jnp.swapaxes(dP, -1, -2))
    X = _tri_solve_compact(
        L, jnp.swapaxes(_tri_solve_compact(L, dPs, True, False), -1, -2),
        True, False,
    )
    Phi = jnp.tril(X, -1) + 0.5 * jnp.tril(jnp.triu(X))
    return L, L @ Phi


def _tri_solve_scan_impl(L, B, D: int, lower: bool, trans: bool):
    """Substitution as a lax.scan over rows (O(1) traced primitives)."""
    batch = jnp.broadcast_shapes(L.shape[:-2], B.shape[:-2])
    L = jnp.broadcast_to(L, batch + L.shape[-2:])
    B = jnp.broadcast_to(B, batch + B.shape[-2:])
    forward = lower != trans
    idxs = jnp.arange(D) if forward else jnp.arange(D - 1, -1, -1)
    ar = jnp.arange(D)

    def step(X, i):
        # op(L)[i, :]: row i of L, or column i when transposed
        row = jnp.sum(
            jnp.where((ar == i)[:, None] if not trans else (ar == i)[None, :],
                      L, 0.0),
            axis=-2 if not trans else -1,
        )                                               # (..., D)
        mask = (ar < i) if forward else (ar > i)
        row_m = jnp.where(mask, row, 0.0)
        b_i = jnp.sum(jnp.where((ar == i)[:, None], B, 0.0), axis=-2)
        s = b_i - jnp.einsum("...k,...kj->...j", row_m, X)
        diag = jnp.sum(jnp.where(ar == i, row, 0.0), axis=-1)
        # rank-deficient L (zeroed columns from the guarded _chol_compact on
        # semidefinite input) gets a zero solution row, not Inf/NaN —
        # mirrors the d>0 safe-reciprocal in _chol_scan_impl.
        inv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
        x_i = s * inv[..., None]
        X = X + x_i[..., None, :] * (ar == i)[..., :, None]
        return X, None

    X, _ = jax.lax.scan(step, jnp.zeros_like(B), idxs)
    return X


def _tri_solve_compact(L, B, lower, trans):
    """Compact triangular solve via lax.custom_linear_solve: the scan impl
    is opaque to AD, while JVP/transpose rules come from the linear-solve
    structure (dX = op(L)^{-1}(dB - op(dL) X); cotangents route through the
    transposed solve) — both stay O(1) traced primitives."""
    D = L.shape[-1]
    batch = jnp.broadcast_shapes(L.shape[:-2], B.shape[:-2])
    L = jnp.broadcast_to(L, batch + L.shape[-2:])
    B = jnp.broadcast_to(B, batch + B.shape[-2:])
    base = jnp.tril(L) if lower else jnp.triu(L)

    def mv(x):
        op = jnp.swapaxes(base, -1, -2) if trans else base
        return op @ x

    def solve(_mv, b):
        return _tri_solve_scan_impl(base, b, D, lower, trans)

    def t_solve(_mv, b):
        return _tri_solve_scan_impl(base, b, D, lower, not trans)

    return jax.lax.custom_linear_solve(mv, B, solve, t_solve)

# Trace-time escape hatch for LATENCY-bound call sites: unbatched/thin
# constant-operator chains (the steady engine's warmup power chain and
# fixed-point squarings) pay ~0.5-1 ms of XLA-TPU custom-call latency per
# small cholesky/triangular_solve — ~5 such calls per element combine, and
# the chains are 12-25 combines deep (an N-independent ~100-200 ms floor,
# probes/f64_combine_micro.py). Inside `latency_mode()` the unrolled
# mid-D paths run regardless of batch size: pure elementwise code XLA
# fuses into the surrounding program, no custom calls. Do NOT use inside
# per-step scan bodies (see _UNROLL_MIN_BATCH note above).
_FORCE_UNROLL = False


class latency_mode:
    """Context manager forcing the unrolled cholesky/tri_solve paths for
    D <= _UNROLL_MAX_D independent of batch size. Trace-time only: wrap the
    *construction* of constant-operator chains, not data passes."""

    def __enter__(self):
        global _FORCE_UNROLL
        self._prev = _FORCE_UNROLL
        _FORCE_UNROLL = True
        return self

    def __exit__(self, *exc):
        global _FORCE_UNROLL
        _FORCE_UNROLL = self._prev
        return False


def _batch_elems(*shapes) -> int:
    import numpy as _np

    batch = jnp.broadcast_shapes(*[s[:-2] for s in shapes])
    return int(_np.prod(batch)) if batch else 1


def _avoid_native(dtype) -> bool:
    """Avoid XLA's native cholesky/triangular_solve custom calls for f64 on
    the TPU backend: they are numerically fine in isolation (exact to 1e-13
    vs CPU at (64, 5, 5)) but produce all-NaN output when embedded in larger
    scan graphs — measured on v5e inside the basis/steady f64 warmup-head
    phases, where the same graph with the custom-call-free unrolled paths is
    finite and correct (probes/c3_nan_bisect3.py, round 5; cf. the known
    TPU f64 LuDecomposition hole, CLAUDE.md). Applies for every D the
    unrolled/compact paths support (D <= _UNROLL_MAX_D)."""
    return dtype == jnp.float64 and jax.default_backend() == "tpu"


def cholesky(P):
    """Lower Cholesky factor, batched; unrolled for moderate D (see
    _chol_unrolled_col) when the batch is fat, closed-form for D <= 4."""
    D = P.shape[-1]
    if D <= 4:
        return _chol_unrolled(P, D)
    if D <= _UNROLL_MAX_D:
        fat = _batch_elems(P.shape) >= _UNROLL_MIN_BATCH
        if fat:
            return _chol_mid(P)
        if _FORCE_UNROLL or _avoid_native(P.dtype):
            # thin latency-mode call: compact scan form — same custom-call-
            # free runtime, O(1) traced primitives (see block comment above)
            return _chol_compact(P)
    return jnp.linalg.cholesky(P)


def _tri_solve_unrolled(L, B, D: int, lower: bool, trans: bool):
    """Solve op(L) X = B with op(L) triangular, unrolled for D<=4.

    L: (..., D, D) lower-triangular. B: (..., D, K). trans=True solves L^T X = B.
    """
    # Represent B rows as list of (..., K)
    b = [B[..., i, :] for i in range(D)]
    x = [None] * D
    if lower != trans:  # forward substitution on effective-lower matrix
        order = range(D)
    else:
        order = range(D - 1, -1, -1)
    for i in order:
        s = b[i]
        if not trans:
            for j in range(D):
                if j == i:
                    continue
                coeff = L[..., i, j]
                use = (j < i) if lower else (j > i)
                if use:
                    s = s - coeff[..., None] * x[j]
            x[i] = s / L[..., i, i][..., None]
        else:
            for j in range(D):
                if j == i:
                    continue
                coeff = L[..., j, i]
                use = (j > i) if lower else (j < i)
                if use:
                    s = s - coeff[..., None] * x[j]
            x[i] = s / L[..., i, i][..., None]
    return jnp.stack(x, axis=-2)


import functools as _functools


def _tri_solve_rows(L, B, D: int, lower: bool, trans: bool):
    """Row-vectorised substitution: O(D) traced ops (one einsum per row)
    instead of the O(D^2) per-entry unroll — keeps compile times sane at
    D ~ 30-48 while staying pure elementwise/VPU at runtime."""
    batch = jnp.broadcast_shapes(L.shape[:-2], B.shape[:-2])
    L = jnp.broadcast_to(L, batch + L.shape[-2:])
    B = jnp.broadcast_to(B, batch + B.shape[-2:])
    # op(L) is lower-triangular (forward substitution) iff lower != trans
    forward = lower != trans
    order = range(D) if forward else range(D - 1, -1, -1)
    xs = {}
    for n, i in enumerate(order):
        s = B[..., i, :]
        if n:
            js = slice(0, i) if forward else slice(i + 1, D)
            c = L[..., js, i] if trans else L[..., i, js]
            prev = jnp.stack(
                [xs[j] for j in (range(i) if forward else range(i + 1, D))],
                axis=-2,
            )
            s = s - jnp.einsum("...k,...kj->...j", c, prev)
        xs[i] = s / L[..., i, i][..., None]
    return jnp.stack([xs[i] for i in range(D)], axis=-2)


@_functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3))
def _tri_solve_mid(L, B, lower, trans):
    return _tri_solve_rows(L, B, L.shape[-1], lower, trans)


@_tri_solve_mid.defjvp
def _tri_solve_mid_jvp(lower, trans, primals, tangents):
    """dX = op(L)^{-1} (dB - op(dL) X): O(X) residuals instead of the
    substitution chain's per-row intermediates."""
    L, B = primals
    dL, dB = tangents
    X = _tri_solve_unrolled(L, B, L.shape[-1], lower, trans)
    opdL = jnp.swapaxes(dL, -1, -2) if trans else dL
    rhs = dB - opdL @ X
    return X, _tri_solve_unrolled(L, rhs, L.shape[-1], lower, trans)


def tri_solve(L, B, *, lower=True, trans=False):
    """Batched triangular solve op(L) X = B on trailing axes. Unrolled
    substitution for moderate D (XLA-TPU's triangular_solve lowering is
    slow for batched small matrices, cf. _chol_unrolled_col)."""
    D = L.shape[-1]
    if D <= 4:
        return _tri_solve_unrolled(L, B, D, lower, trans)
    if D <= _UNROLL_MAX_D:
        fat = _batch_elems(L.shape, B.shape) >= _UNROLL_MIN_BATCH
        if fat:
            return _tri_solve_mid(L, B, lower, trans)
        if _FORCE_UNROLL or _avoid_native(L.dtype):
            return _tri_solve_compact(L, B, lower, trans)
    # jax.scipy.solve_triangular does not numpy-broadcast mismatched batch
    # dims (e.g. block-batched L (B,D,D) vs time-invariant Fill rhs (D,K));
    # broadcast explicitly.
    batch = jnp.broadcast_shapes(L.shape[:-2], B.shape[:-2])
    L = jnp.broadcast_to(L, batch + L.shape[-2:])
    B = jnp.broadcast_to(B, batch + B.shape[-2:])
    return jax.scipy.linalg.solve_triangular(
        L, B, lower=lower, trans=1 if trans else 0
    )


def chol_solve(L, B):
    """Solve (L L^T) X = B given lower Cholesky L; batched."""
    return tri_solve(L, tri_solve(L, B, lower=True, trans=False), lower=True, trans=True)


def psd_solve(P, B, eps=0.0):
    """Solve P X = B for symmetric PSD P via Cholesky; batched."""
    if eps:
        P = add_jitter(P, eps)
    return chol_solve(cholesky(symmetrize(P)), B)


def _inv_unrolled(P, D: int):
    """Closed-form inverse via adjugate for D<=3 (pure VPU code)."""
    if D == 1:
        return 1.0 / P
    if D == 2:
        a, b = P[..., 0, 0], P[..., 0, 1]
        c, d = P[..., 1, 0], P[..., 1, 1]
        det = a * d - b * c
        inv_det = 1.0 / det
        row0 = jnp.stack([d, -b], axis=-1)
        row1 = jnp.stack([-c, a], axis=-1)
        return jnp.stack([row0, row1], axis=-2) * inv_det[..., None, None]
    if D == 3:
        m = lambda i, j: P[..., i, j]
        c00 = m(1, 1) * m(2, 2) - m(1, 2) * m(2, 1)
        c01 = m(1, 2) * m(2, 0) - m(1, 0) * m(2, 2)
        c02 = m(1, 0) * m(2, 1) - m(1, 1) * m(2, 0)
        det = m(0, 0) * c00 + m(0, 1) * c01 + m(0, 2) * c02
        c10 = m(0, 2) * m(2, 1) - m(0, 1) * m(2, 2)
        c11 = m(0, 0) * m(2, 2) - m(0, 2) * m(2, 0)
        c12 = m(0, 1) * m(2, 0) - m(0, 0) * m(2, 1)
        c20 = m(0, 1) * m(1, 2) - m(0, 2) * m(1, 1)
        c21 = m(0, 2) * m(1, 0) - m(0, 0) * m(1, 2)
        c22 = m(0, 0) * m(1, 1) - m(0, 1) * m(1, 0)
        adj = jnp.stack(
            [
                jnp.stack([c00, c10, c20], axis=-1),
                jnp.stack([c01, c11, c21], axis=-1),
                jnp.stack([c02, c12, c22], axis=-1),
            ],
            axis=-2,
        )
        return adj / det[..., None, None]
    raise ValueError(D)


def small_inv(P):
    """Batched matrix inverse; adjugate closed form for D<=3, LU otherwise."""
    D = P.shape[-1]
    if D <= 3:
        return _inv_unrolled(P, D)
    return jnp.linalg.inv(P)


def solve_via_inv(P, B):
    """P^{-1} B using small_inv — used inside associative-scan combines where
    a fused batched matmul beats a triangular solve on TPU."""
    return small_inv(P) @ B


def psd_root(P):
    """A (not necessarily triangular) square root U with U U^T = P, for
    symmetric PSD P that may be rank-deficient (e.g. the exact Q = 0 of
    deterministic Cosine/Constant state blocks, reference:
    src/gp/lti_sde.jl:239-250,311-320).

    For D <= 4 the guarded unrolled Cholesky already handles semidefinite
    inputs (max(s, 0) pivots, zeroed inverse columns). For larger D,
    `jnp.linalg.cholesky` returns NaN on exactly-singular input, so we use a
    symmetric eigendecomposition with clamped eigenvalues — typically called
    once per model on Fill (time-invariant) parameters, so the eigh cost is
    amortised across the whole series.
    """
    P = symmetrize(P)
    D = P.shape[-1]
    if D <= 4:
        return _chol_unrolled(P, D)
    w, V = jnp.linalg.eigh(P)
    w = jnp.sqrt(jnp.maximum(w, 0.0))
    return V * w[..., None, :]


def logdet_from_chol(L):
    """log det(L L^T) = 2 sum log diag(L); batched."""
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def diag_Xt_A_X(A, X):
    """diag(X^T A X) on trailing axes (reference: util/linear_algebra.jl:5-9)."""
    return jnp.einsum("...ij,...ik,...kj->...j", X, A, X)


def diag_At_B(A, B):
    """diag(A^T B) (reference: util/linear_algebra.jl:14-16)."""
    return jnp.einsum("...ij,...ij->...j", A, B)


def quad_form(A, P):
    """A P A^T on trailing axes."""
    return A @ P @ jnp.swapaxes(A, -1, -2)


def block_diag(mats):
    """Dense block-diagonal of a list of (..., Di, Di) matrices
    (reference: src/gp/lti_sde.jl:440-445). Leading axes must broadcast."""
    if len(mats) == 1:
        return mats[0]
    sizes_r = [m.shape[-2] for m in mats]
    sizes_c = [m.shape[-1] for m in mats]
    batch = jnp.broadcast_shapes(*[m.shape[:-2] for m in mats])
    dtype = jnp.result_type(*[m.dtype for m in mats])
    out = jnp.zeros(batch + (sum(sizes_r), sum(sizes_c)), dtype)
    r = c = 0
    for m, sr, sc in zip(mats, sizes_r, sizes_c):
        out = out.at[..., r : r + sr, c : c + sc].set(m)
        r += sr
        c += sc
    return out
