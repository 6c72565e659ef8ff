"""Multi-chip distributed Kalman filtering via shard_map over a device Mesh.

The reference is single-process with a sequential loop (reference:
src/util/scan.jl:15-28) — no distributed execution exists there. This module
is the TPU-native scaling design: the time axis is sharded across devices
(sequence parallelism over ICI), each device reduces its chunk to ONE
filtering element (ops/block.chunk_total_element), the tiny per-device
elements are exchanged with a single all_gather, an exclusive prefix gives
every device its exact boundary filtering state, and each device finishes its
chunk locally. Communication volume is O(n_dev * D^2) per logpdf — independent
of N.

An optional leading batch axis of independent series shards over a second
mesh axis (data parallelism): mesh ("dp", "t") covers dp x sp for this model
family (there is no tensor/pipeline dimension in an O(D^2) state recursion —
D is 2-16; the FLOPs live along time and batch).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
# NB: the stable jax.shard_map (v0.8+) enforces varying-axes (VMA) typing on
# scan carries, which would require pvary plumbing through every engine; the
# experimental entry point with check_rep=False matches our replication
# pattern (constants combined with axis-varying data inside local scans).
import warnings

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    from jax.experimental.shard_map import shard_map

from ..config import precision_ctx
from ..models import emissions as em
from ..ops import block
from ..ops.assoc import _combine_filter as _combine
from ..utils import psd
from ..utils.fill import Fill, is_fill
from ..utils.gaussian import Gaussian


def _flatten_params(model):
    params = ((model.trans.As, model.trans.offs, model.trans.Qs), model.emis)
    leaves, treedef = jax.tree_util.tree_flatten(params, is_leaf=is_fill)
    fill_mask = [is_fill(l) for l in leaves]
    arrs = [l for l, m in zip(leaves, fill_mask) if not m]
    fills = [l.value for l, m in zip(leaves, fill_mask) if m]
    return treedef, fill_mask, arrs, fills


def _rebuild(treedef, fill_mask, arrs, fills, n_local):
    it_a, it_f = iter(arrs), iter(fills)
    leaves = [
        Fill(next(it_f), n_local) if m else next(it_a) for m in fill_mask
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _check_divisible(N, mesh, time_axis):
    n_dev = mesh.shape[time_axis]
    if N % n_dev != 0:
        raise ValueError(
            f"series length {N} must be divisible by the {time_axis!r} mesh "
            f"axis size {n_dev}; pad the series (NaN observations are treated "
            "as missing, models/missings.py) to a multiple."
        )


def sharded_logpdf(
    model,
    y,
    mesh: Mesh,
    *,
    time_axis: str = "t",
    batch_axis: Optional[str] = None,
    n_blocks: Optional[int] = None,
):
    """Distributed logpdf of a forward scalar-emission LGSSM.

    y: (N,) scalar-emission series or (N, Dout) vector-emission series
    (e.g. a spatio-temporal grid model in time form); with `batch_axis`
    set, a leading batch axis of independent series sharing the model.
    Returns the scalar total logpdf (summed over the batch if batched).
    """
    if not model.trans.forward:
        raise NotImplementedError("sharded_logpdf supports forward models")
    scalar = isinstance(model.emis, em.ScalarEmissions)
    y = jnp.asarray(y)
    base_ndim = 1 if scalar else 2
    batched = y.ndim == base_ndim + 1
    time_dim = -1 if scalar else -2
    _check_divisible(y.shape[time_dim], mesh, time_axis)
    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    treedef, fill_mask, arrs, fills = _flatten_params(model)

    if batched and batch_axis is None:
        raise ValueError("batched y requires batch_axis")

    if scalar:
        y_spec = P(batch_axis, time_axis) if batched else P(time_axis)
    else:
        y_spec = (
            P(batch_axis, time_axis, None) if batched else P(time_axis, None)
        )
    arr_specs = tuple(P(time_axis) for _ in arrs)
    fill_specs = tuple(P() for _ in fills)
    x0_spec = (P(), P())

    def local_fn(y_loc, arrs_loc, fills_loc, x0_loc):
        n_local = y_loc.shape[-1] if scalar else y_loc.shape[-2]
        params = _rebuild(treedef, fill_mask, list(arrs_loc), list(fills_loc), n_local)
        x0_g = Gaussian(*x0_loc)

        def one_series(y1):
            return block.chunk_total_element((params, y1), D, dtype, n_blocks=n_blocks)

        prior = (
            jnp.zeros((D, D), dtype),
            x0_g.mean.astype(dtype),
            psd.symmetrize(x0_g.cov).astype(dtype),
            jnp.zeros((D,), dtype),
            jnp.zeros((D, D), dtype),
        )

        def prefix_and_lml(y1):
            agg = one_series(y1)
            all_agg = jax.lax.all_gather(agg, time_axis)  # (n_dev, ...)

            # Exclusive prefix over the tiny device-level elements: the carry
            # BEFORE combining device d's aggregate is d's boundary element.
            def fold(c, e):
                return _combine(c, e), c

            _, excl = jax.lax.scan(fold, prior, all_agg)
            idx = jax.lax.axis_index(time_axis)
            start_elem = jax.tree_util.tree_map(lambda a: a[idx], excl)
            start = Gaussian(start_elem[1], start_elem[2])
            return block.chunk_logpdf_from_start(
                (params, y1), start, D, dtype, n_blocks=n_blocks
            )

        if batched:
            lml_loc = jnp.sum(jax.vmap(prefix_and_lml)(y_loc))
        else:
            lml_loc = prefix_and_lml(y_loc)
        total = jax.lax.psum(lml_loc, time_axis)
        if batched:
            total = jax.lax.psum(total, batch_axis)
        return total

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(y_spec, arr_specs, fill_specs, x0_spec),
        out_specs=P(),
        check_rep=False,
    )
    with precision_ctx(D):
        return fn(jnp.asarray(y), tuple(arrs), tuple(fills), (x0.mean, x0.cov))


# ---------------------------------------------------------------------------
# Distributed smoother / posterior sampler
# ---------------------------------------------------------------------------
#
# Both passes mirror the distributed filter: local chunk reduction to O(D^2)
# elements, ONE all_gather, a tiny per-device prefix, local finish. The
# backward (smoothing) recursion composes the inverted dynamics
# x_{t-1} | x_t ~ N(G_t x_t + g_t, L_t) (reference semantics:
# src/models/lgssm.jl:193-240) as affine-Gaussian elements, so the suffix
# composition from the series end is associative and shards over time exactly
# like the forward filter.


def _local_reverse_dynamics(params, y_loc, start, D, dtype, n_blocks):
    """Filter a chunk from its exact boundary state and invert its dynamics.

    Returns (G, g, L) with leading local-time axis: step t's element maps the
    smoothed distribution at t to the smoothed distribution at t-1.
    """
    from ..models.gauss_markov import GaussMarkov
    from ..models.lgssm import LGSSM, _invert_dynamics
    from ..ops.assoc import _batched_predict
    from ..utils.fill import tmaterialize

    (As, offs, Qs), emis = params
    local_model = LGSSM(
        GaussMarkov(As=As, offs=offs, Qs=Qs, x0=start, forward=True), emis
    )
    xfs = block.filter_(local_model, y_loc, n_blocks=n_blocks)  # (n, D)

    F = tmaterialize(As).astype(dtype)
    c = tmaterialize(offs).astype(dtype)
    Q = tmaterialize(Qs).astype(dtype)
    prev = Gaussian(
        jnp.concatenate([start.mean[None].astype(dtype), xfs.mean[:-1]], axis=0),
        jnp.concatenate([psd.symmetrize(start.cov)[None].astype(dtype), xfs.cov[:-1]], axis=0),
    )
    xp = _batched_predict(prev, F, c, Q)
    G, g, L = _invert_dynamics(prev, xp, F)
    return (G, g, L), xfs


def _suffix_boundary(elems_rev_total, time_axis):
    """all_gather per-device backward elements and return this device's
    suffix composition R_d: the affine-Gaussian map from the global final
    state to this device's last step."""
    from ..ops.assoc import _combine_affine

    all_T = jax.lax.all_gather(elems_rev_total, time_axis)  # (n_dev, ...)
    n_dev = all_T[0].shape[0]
    ident = (
        jnp.eye(all_T[0].shape[-1], dtype=all_T[0].dtype),
        jnp.zeros_like(all_T[1][0]),
        jnp.zeros_like(all_T[2][0]),
    )
    # Exclusive fold in DECREASING device order: carry before device d's
    # total is the composition of all devices to its right.
    rev = jax.tree_util.tree_map(lambda a: jnp.flip(a, 0), all_T)

    def fold(c, e):
        return _combine_affine(c, e), c

    _, excl_rev = jax.lax.scan(fold, ident, rev)
    idx = jax.lax.axis_index(time_axis)
    return jax.tree_util.tree_map(
        lambda a: a[n_dev - 1 - idx], excl_rev
    )


def _apply_affine(elem, x: Gaussian) -> Gaussian:
    A, b, C = elem
    m = jnp.einsum("...ij,...j->...i", A, x.mean) + b
    P = psd.symmetrize(A @ psd.symmetrize(x.cov) @ jnp.swapaxes(A, -1, -2) + C)
    return Gaussian(m, P)


def sharded_posterior_marginals(
    model,
    y,
    mesh: Mesh,
    *,
    time_axis: str = "t",
    observation_space: bool = True,
    n_blocks: Optional[int] = None,
):
    """Distributed RTS smoothing: posterior marginals at every step.

    The result stays sharded over `time_axis`. With `observation_space=True`
    returns (means, vars) of the emission marginals N(H m + h, H P H' + s)
    under the smoothing posterior — the distributed counterpart of
    `marginals_diag(posterior(model, y))`; otherwise the smoothed latent
    Gaussian chain.
    """
    if not model.trans.forward:
        raise NotImplementedError(
            "sharded smoothing supports forward models"
        )
    scalar = isinstance(model.emis, em.ScalarEmissions)
    time_dim = -1 if scalar else -2
    _check_divisible(jnp.shape(y)[time_dim], mesh, time_axis)
    from ..ops.assoc import _combine_affine

    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    treedef, fill_mask, arrs, fills = _flatten_params(model)

    y_spec = P(time_axis) if scalar else P(time_axis, None)
    arr_specs = tuple(P(time_axis) for _ in arrs)
    fill_specs = tuple(P() for _ in fills)
    x0_spec = (P(), P())
    if observation_space and not scalar:
        out_spec = (P(time_axis, None), P(time_axis, None))
    elif observation_space:
        out_spec = (P(time_axis), P(time_axis))
    else:
        out_spec = (P(time_axis), P(time_axis))

    def local_fn(y_loc, arrs_loc, fills_loc, x0_loc):
        n_local = y_loc.shape[-1] if scalar else y_loc.shape[-2]
        params = _rebuild(treedef, fill_mask, list(arrs_loc), list(fills_loc), n_local)
        x0_g = Gaussian(*x0_loc)

        # ---- forward: boundary filtering states (as in sharded_logpdf)
        agg = block.chunk_total_element((params, y_loc), D, dtype, n_blocks=n_blocks)
        all_agg = jax.lax.all_gather(agg, time_axis)
        prior = (
            jnp.zeros((D, D), dtype),
            x0_g.mean.astype(dtype),
            psd.symmetrize(x0_g.cov).astype(dtype),
            jnp.zeros((D,), dtype),
            jnp.zeros((D, D), dtype),
        )

        def ffold(c, e):
            return _combine(c, e), c

        incl, excl = jax.lax.scan(ffold, prior, all_agg)
        idx = jax.lax.axis_index(time_axis)
        start_elem = jax.tree_util.tree_map(lambda a: a[idx], excl)
        start = Gaussian(start_elem[1], start_elem[2])
        x_final = Gaussian(incl[1], incl[2])  # filtering state at step N

        # ---- local dynamics inversion
        (G, g, L), _xfs = _local_reverse_dynamics(
            params, y_loc, start, D, dtype, n_blocks
        )

        # ---- backward: suffix composition across devices
        elems_rev = jax.tree_util.tree_map(lambda a: jnp.flip(a, 0), (G, g, L))
        ident1 = (
            jnp.eye(D, dtype=dtype)[None],
            jnp.zeros((1, D), dtype),
            jnp.zeros((1, D, D), dtype),
        )
        with_ident = tuple(
            jnp.concatenate([i, e], axis=0) for i, e in zip(ident1, elems_rev)
        )
        pref = jax.lax.associative_scan(_combine_affine, with_ident, axis=0)
        total = jax.tree_util.tree_map(lambda a: a[-1], pref)
        R = _suffix_boundary(total, time_axis)
        x_end = _apply_affine(R, x_final)  # smoothed state at this chunk's last step

        # prefix k (0..n_local-1) composes E_{end} .. E_{end-k+1}: applying it
        # to x_end gives the smoothed marginal k steps before the chunk end.
        pref_head = jax.tree_util.tree_map(lambda a: a[:-1], pref)
        sm_rev = _apply_affine(pref_head, x_end)
        xs = jax.tree_util.tree_map(lambda a: jnp.flip(a, 0), sm_rev)

        if not observation_space:
            return xs.mean, xs.cov
        from ..utils.fill import tmaterialize

        emis_b = jax.tree_util.tree_map(
            lambda l: l.astype(dtype) if hasattr(l, "astype") else l,
            tmaterialize(params[1]),
        )
        mean, var = em.step_predict_marginals(xs, emis_b)
        return mean, var

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(y_spec, arr_specs, fill_specs, x0_spec),
        out_specs=out_spec,
        check_rep=False,
    )
    with precision_ctx(D):
        out = fn(jnp.asarray(y), tuple(arrs), tuple(fills), (x0.mean, x0.cov))
    return Gaussian(*out) if not observation_space else out


def sharded_posterior_rand(
    key,
    model,
    y,
    mesh: Mesh,
    *,
    time_axis: str = "t",
    n_blocks: Optional[int] = None,
):
    """Distributed joint posterior sample of the latent function values
    (H x_t + h, the noiseless emission mean), sharded over `time_axis`.

    Backward simulation: x_N ~ filtering final, x_{t-1} = G_t x_t + g_t + w_t,
    w_t ~ N(0, L_t) — composed distributionally as affine-MEAN elements
    (G_t, g_t + chol(L_t) eps_t), which shard exactly like the marginals.
    """
    if not model.trans.forward:
        raise NotImplementedError("sharded sampling supports forward models")
    scalar = isinstance(model.emis, em.ScalarEmissions)
    time_dim = -1 if scalar else -2
    _check_divisible(jnp.shape(y)[time_dim], mesh, time_axis)
    from ..ops.assoc import _combine_affine_mean

    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    N = jnp.shape(y)[time_dim]
    treedef, fill_mask, arrs, fills = _flatten_params(model)

    # Pre-draw ALL randomness outside shard_map (the reference pre-draws
    # epsilons for re-executability, reference: src/models/lgssm.jl:72-77;
    # here it also keeps the shard_map body deterministic).
    k_eps, k_final = jax.random.split(key)
    eps = jax.random.normal(k_eps, (N, D), dtype)
    eps_final = jax.random.normal(k_final, (D,), dtype)

    y_spec = P(time_axis) if scalar else P(time_axis, None)
    arr_specs = tuple(P(time_axis) for _ in arrs)
    fill_specs = tuple(P() for _ in fills)

    def local_fn(y_loc, eps_loc, eps_f, arrs_loc, fills_loc, x0_loc):
        n_local = y_loc.shape[-1] if scalar else y_loc.shape[-2]
        params = _rebuild(treedef, fill_mask, list(arrs_loc), list(fills_loc), n_local)
        x0_g = Gaussian(*x0_loc)

        agg = block.chunk_total_element((params, y_loc), D, dtype, n_blocks=n_blocks)
        all_agg = jax.lax.all_gather(agg, time_axis)
        prior = (
            jnp.zeros((D, D), dtype),
            x0_g.mean.astype(dtype),
            psd.symmetrize(x0_g.cov).astype(dtype),
            jnp.zeros((D,), dtype),
            jnp.zeros((D, D), dtype),
        )

        def ffold(c, e):
            return _combine(c, e), c

        incl, excl = jax.lax.scan(ffold, prior, all_agg)
        idx = jax.lax.axis_index(time_axis)
        start_elem = jax.tree_util.tree_map(lambda a: a[idx], excl)
        start = Gaussian(start_elem[1], start_elem[2])

        (G, g, L), _xfs = _local_reverse_dynamics(
            params, y_loc, start, D, dtype, n_blocks
        )
        # realized backward-step offsets; jitter scaled to dtype (f32 grid
        # models have near-singular smoothing covariances, utils/psd.py)
        eps_j = psd.dtype_jitter(dtype)
        Lc = psd.cholesky(psd.add_jitter(psd.symmetrize(L), eps_j))
        b = g + jnp.einsum("nij,nj->ni", Lc, eps_loc)

        # x_N sample: identical on every device (same final state + eps_f)
        Pf = psd.symmetrize(incl[2])
        x_fin = incl[1] + jnp.einsum(
            "ij,j->i", psd.cholesky(psd.add_jitter(Pf, eps_j)), eps_f
        )

        elems_rev = jax.tree_util.tree_map(lambda a: jnp.flip(a, 0), (G, b))
        ident1 = (jnp.eye(D, dtype=dtype)[None], jnp.zeros((1, D), dtype))
        with_ident = tuple(
            jnp.concatenate([i, e], axis=0) for i, e in zip(ident1, elems_rev)
        )
        pref = jax.lax.associative_scan(_combine_affine_mean, with_ident, axis=0)
        total = (pref[0][-1], pref[1][-1])

        all_T = jax.lax.all_gather(total, time_axis)
        n_dev = all_T[0].shape[0]
        identm = (jnp.eye(D, dtype=dtype), jnp.zeros((D,), dtype))
        rev = jax.tree_util.tree_map(lambda a: jnp.flip(a, 0), all_T)

        def bfold(c, e):
            return _combine_affine_mean(c, e), c

        _, excl_rev = jax.lax.scan(bfold, identm, rev)
        Rm = jax.tree_util.tree_map(lambda a: a[n_dev - 1 - idx], excl_rev)
        x_end = jnp.einsum("ij,j->i", Rm[0], x_fin) + Rm[1]

        pref_head = (pref[0][:-1], pref[1][:-1])
        xs_rev = jnp.einsum("nij,j->ni", pref_head[0], x_end) + pref_head[1]
        xs = jnp.flip(xs_rev, 0)

        from ..utils.fill import tmaterialize

        emis_b = jax.tree_util.tree_map(
            lambda l: l.astype(dtype) if hasattr(l, "astype") else l,
            tmaterialize(params[1]),
        )
        return _emission_mean(emis_b, xs)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(y_spec, P(time_axis), P(), arr_specs, fill_specs, (P(), P())),
        out_specs=P(time_axis) if scalar else P(time_axis, None),
        check_rep=False,
    )
    with precision_ctx(D):
        return fn(
            jnp.asarray(y), eps, eps_final, tuple(arrs), tuple(fills),
            (x0.mean, x0.cov),
        )


def _emission_mean(e, xs):
    """Noiseless emission mean H x + h (batched over the leading time axis)
    for every emission variant — the 'latent function value' the posterior
    sampler returns (reference semantics: posterior rand emits the noiseless
    process, src/gp/posterior_lti_sde.jl:60-74)."""
    if isinstance(e, em.ScalarEmissions):
        return jnp.einsum("ni,ni->n", e.H, xs) + e.h
    if isinstance(e, em.DenseEmissions):
        return jnp.einsum("nij,nj->ni", e.H, xs) + e.h
    if isinstance(e, em.LargeEmissions):
        return jnp.einsum("nij,nj->ni", e.C, xs) + e.c
    if isinstance(e, em.BottleneckEmissions):
        inner = jnp.einsum("nij,nj->ni", e.H, xs) + e.h
        return jnp.einsum("nij,nj->ni", e.C, inner) + e.c
    raise TypeError(type(e))


# ---------------------------------------------------------------------------
# Distributed steady-state logpdf
# ---------------------------------------------------------------------------


def _lyap_partial_sum(G, C, n):
    """Sum_{t=0}^{n-1} G'^t C G^t by doubling: (P, S) -> (P^2, S + P'SP),
    log2(n) (D, D) matmuls. n must be a power of two times the base case
    handled by splitting on the binary digits of n."""
    # general n: binary decomposition. S_a+b = S_a + P_a' S_b P_a.
    P_cur, S_cur = G, C  # covers n = 1 ... as (G^1, sum over t<1)
    S_tot = None
    P_tot = None
    m = n
    while m:
        if m & 1:
            if S_tot is None:
                S_tot, P_tot = S_cur, P_cur
            else:
                S_tot = S_cur + P_cur.T @ S_tot @ P_cur
                P_tot = P_tot @ P_cur
        S_cur = S_cur + P_cur.T @ S_cur @ P_cur
        P_cur = P_cur @ P_cur
        m >>= 1
    return S_tot


def _mat_pow(G, n):
    """G^n by binary powering."""
    out = jnp.eye(G.shape[0], dtype=G.dtype)
    P_cur = G
    m = n
    while m:
        if m & 1:
            out = P_cur @ out
        P_cur = P_cur @ P_cur
        m >>= 1
    return out


def sharded_steady_logpdf(
    model,
    y,
    mesh: Mesh,
    *,
    time_axis: str = "t",
    n_warmup: Optional[int] = None,
    n_blocks: Optional[int] = None,
    block_len: int = 16,
):
    """Distributed steady-state logpdf of a Fill forward model.

    The sharded analogue of ops/steady.logpdf (docs/ROADMAP.md item 6):
    the warmup prefix y[:k] is REPLICATED and exactly filtered on every
    chip (O(k) constant work); each chip then reduces its late chunk to an
    affine aggregate plus a QUADRATIC lml form in its unknown chunk-start
    filtering mean — alpha (data sum), beta (one reverse constant-matrix
    recursion), Gamma (partial Lyapunov sum, data-free and replicated).
    One all_gather of O(n_dev * D^2), an exclusive affine prefix, and the
    total lml assembles in closed form. Chip 0's aggregate matrix is ZERO
    (its start state is injected from the warmup via input masking), which
    makes the whole program SPMD-uniform — no per-chip branches.

    Same contract as ops/steady: no missing data, Fill params, forward
    ordering; approximation error rho^(2 n_warmup)."""
    from ..ops import lti, steady

    if not model.trans.forward:
        raise NotImplementedError("sharded_steady_logpdf: forward models only")
    if not steady.supported(model):
        raise ValueError(
            "sharded_steady_logpdf requires an all-Fill model without "
            "deterministic diffusion blocks"
        )
    scalar = isinstance(model.emis, em.ScalarEmissions)
    y = jnp.asarray(y)
    time_dim = -1 if scalar else -2
    N = y.shape[time_dim]
    _check_divisible(N, mesh, time_axis)
    n_dev = mesh.shape[time_axis]
    n_loc = N // n_dev
    k = steady._round_warmup(n_warmup or steady.DEFAULT_WARMUP, N)
    if k >= n_loc and n_warmup is not None and n_warmup < n_loc:
        # honor an explicit warmup that rounding would push past the
        # per-chip chunk (B_w degrades gracefully via the halving loop)
        k = int(n_warmup)
    if k >= n_loc:
        raise ValueError(
            f"per-chip chunk length {n_loc} must exceed the warmup {k}; "
            "use fewer chips, a shorter warmup, or the generic "
            "sharded_logpdf"
        )
    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    treedef, fill_mask, arrs, fills = _flatten_params(model)
    assert not arrs, "all-Fill checked above"
    y_warm = jax.lax.slice_in_dim(y, 0, k, axis=time_dim)

    y_spec = P(time_axis) if scalar else P(time_axis, None)
    warm_spec = P() if scalar else P(None, None)
    fill_specs = tuple(P() for _ in fills)

    def local_fn(y_loc, y_warm_loc, fills_loc, x0_loc):
        model_loc = _rebuild(treedef, fill_mask, [], list(fills_loc), n_loc)
        from ..models.lgssm import LGSSM
        from ..models.gauss_markov import GaussMarkov

        (As_l, offs_l, Qs_l), emis_l = model_loc
        trans_l = GaussMarkov(
            As=As_l, offs=offs_l, Qs=Qs_l,
            x0=Gaussian(*x0_loc), forward=True,
            det_blocks=model.trans.det_blocks,
        )
        m_loc = LGSSM(trans_l, emis_l)

        # replicated: exact warmup on y[:k] + constant steady operators
        B_w = 16
        while k % B_w:
            B_w //= 2
        q = lti._filter_pass(
            steady._trim(m_loc, k), y_warm_loc, n_blocks=B_w,
            cov_hi="full" if D <= 8 else "chain",
        )
        lp_warm = lti._lml_from_filter(q)
        m_start_warm = q["means"][-1]
        ops = steady._steady_ops(m_loc, dtype, N, n_warmup=k)
        G, c_w, A0, a0 = ops["G"], ops["c_w"], ops["A0"], ops["a0"]

        idx = jax.lax.axis_index(time_axis)
        t_loc = jnp.arange(n_loc)
        if scalar:
            H, h, S = ops["H"], ops["h"], ops["S"]
            # c_w already carries -K h (see ops/steady._steady_ops); adding
            # K*(y-h) would double-subtract the emission offset.
            w = c_w[None, :] + y_loc[:, None] * ops["K"][None, :]
        else:
            H_eff, h_eff, S_inv = ops["H_eff"], ops["h_eff"], ops["S_inv"]
            w = c_w[None, :] + y_loc @ ops["K"].T
        # chip-0 masking: zero w before the warmup boundary, inject the
        # warmup's final filtering mean at local index k-1
        on0 = (idx == 0)
        premask = on0 & (t_loc < k)
        w = jnp.where(premask[:, None], 0.0, w)
        w = jnp.where(
            (on0 & (t_loc == k - 1))[:, None], m_start_warm[None, :], w
        )

        # zero-init local filtered chain + affine aggregate
        z = steady.affine_const_states(
            G, w, jnp.zeros((D,), dtype), block_len=block_len
        )
        v_c = z[-1]
        M_c = jnp.where(on0, 0.0, 1.0) * _mat_pow(G, n_loc)

        # residuals of the zero-init chain: r0_t = y_t - (H(A z_{t-1}+a)+h)
        z_prev = jnp.concatenate([jnp.zeros((1, D), dtype), z[:-1]], axis=0)
        m_pred0 = z_prev @ A0.T + a0
        if scalar:
            r0 = y_loc - (m_pred0 @ H + h)
        else:
            r0 = y_loc - (m_pred0 @ H_eff.T + h_eff)
        # mask out warmup-covered steps on chip 0 (their lml is lp_warm)
        lml_mask = jnp.where(on0 & (t_loc < k), 0.0, 1.0)

        # quadratic lml pieces
        if scalar:
            alpha = jnp.sum(lml_mask * r0 * r0) / S
            u = (lml_mask * r0)[:, None] * (A0.T @ H / S)[None, :]
        else:
            rw = r0 @ S_inv.T
            alpha = jnp.sum(lml_mask[:, None] * r0 * rw)
            u = (lml_mask[:, None] * rw) @ (ops["H_eff"] @ A0)
        # beta = sum_t G'^t u_t: backward recursion s_j = u_j + G' s_{j+1}
        s_rev = steady.affine_const_states(
            G.T, jnp.flip(u, 0), jnp.zeros((D,), dtype), block_len=block_len
        )
        beta = s_rev[-1]
        if scalar:
            C_mat = jnp.outer(A0.T @ H, A0.T @ H) / S
        else:
            HA = ops["H_eff"] @ A0
            C_mat = HA.T @ S_inv @ HA
        Gamma = _lyap_partial_sum(G, C_mat, n_loc)

        # exchange aggregates; exclusive affine prefix gives chunk starts
        all_M = jax.lax.all_gather(M_c, time_axis)       # (n_dev, D, D)
        all_v = jax.lax.all_gather(v_c, time_axis)       # (n_dev, D)

        def fold(x, Mv):
            M, v = Mv
            return M @ x + v, x

        _, excl = jax.lax.scan(fold, jnp.zeros((D,), dtype), (all_M, all_v))
        x_c = excl[idx]
        x_c = jnp.where(on0, 0.0, x_c)

        quad = alpha - 2.0 * beta @ x_c + x_c @ (Gamma @ x_c)
        cnt = jnp.sum(lml_mask)
        import math as _math

        if scalar:
            per = ops["logdetS"] + _math.log(2.0 * _math.pi)
        else:
            per = ops["logdetS"] + ops["Dout"] * _math.log(2.0 * _math.pi)
        lml_loc = -0.5 * (cnt * per + quad)
        lml_loc = lml_loc + jnp.where(on0, lp_warm, 0.0)
        return jax.lax.psum(lml_loc, time_axis)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(y_spec, warm_spec, fill_specs, (P(), P())),
        out_specs=P(),
        check_rep=False,
    )
    with precision_ctx(D):
        return fn(y, y_warm, tuple(fills), (x0.mean, x0.cov))


# ---------------------------------------------------------------------------
# Distributed basis-marginalised logpdf (det-block sum kernels, c3 family)
# ---------------------------------------------------------------------------


def sharded_logpdf_basis(
    fx,
    y,
    mesh: Mesh,
    *,
    time_axis: str = "t",
    n_warmup: Optional[int] = None,
    block_len: int = 16,
):
    """Distributed exact lml of a sum kernel with deterministic components.

    The sharded analogue of gp.lti_sde engine="basis"/sub_engine="steady"
    (ops/basis.grams_steady): split the kernel into stochastic +
    deterministic summands (gp.lti_sde.basis_setup), filter only the
    REDUCED stochastic model, and marginalise the deterministic basis
    weights by Woodbury from innovation Gram matrices. Time is sharded:

      * the exact f64 warmup head (k steps) and the O(1) steady constants
        are REPLICATED on every chip (constant work, no comms);
      * each chip reduces its late chunk once with a ZERO chunk-start to a
        flat-(R*D) affine aggregate, ONE all_gather of O(n_dev * R*D)
        exchanges the aggregates, an exclusive kron-structured fold gives
        every chip its exact start state, and a second local pass computes
        the chunk's innovations;
      * the per-chip (R, R) Gram contributions are psum-ed and the
        Woodbury lml assembles replicated.

    Chip 0's warmup-covered steps are masked out and the head's final
    filtering mean is injected through the input sequence at local index
    k-1, keeping the program SPMD-uniform (same trick as
    sharded_steady_logpdf). Contract = ops/basis.grams_steady: Fill
    forward model, scalar emissions, fully-observed y, approximation
    error rho^(2 n_warmup). The reference trains these kernels
    single-process in f64 (reference: src/gp/lti_sde.jl:255-320); it has
    no distributed execution.
    """
    from ..gp.lti_sde import basis_setup
    from ..ops import basis as bops
    from ..ops import steady

    model, M_cols, P0 = basis_setup(fx)
    if M_cols is None:
        return sharded_steady_logpdf(
            model, y, mesh, time_axis=time_axis, n_warmup=n_warmup,
            block_len=block_len,
        )
    if not model.trans.forward:
        raise NotImplementedError("sharded_logpdf_basis: forward models only")
    if not steady.supported(model):
        raise ValueError(
            "sharded_logpdf_basis requires an all-Fill reduced model"
        )
    if not isinstance(model.emis, em.ScalarEmissions):
        raise ValueError("sharded_logpdf_basis: scalar emissions only")

    D = model.latent_dim
    x0 = model.trans.x0
    dtype = x0.dtype
    hi = steady._hi(dtype)
    N = len(model)
    y = jnp.asarray(y, dtype)
    Y = jnp.concatenate([y[:, None], M_cols], axis=-1)  # (N, R)
    R = Y.shape[-1]
    w_off = jnp.zeros(R, dtype).at[0].set(1.0)

    _check_divisible(N, mesh, time_axis)
    n_dev = mesh.shape[time_axis]
    n_loc = N // n_dev
    k = steady._round_warmup(
        n_warmup or steady.DEFAULT_WARMUP, N, base=64
    )
    if k >= n_loc and n_warmup is not None and n_warmup < n_loc:
        # honor an explicit warmup that rounding would push past the
        # per-chip chunk (B_w degrades gracefully via the halving loop)
        k = int(n_warmup)
    if k >= n_loc:
        raise ValueError(
            f"per-chip chunk length {n_loc} must exceed the warmup {k}; "
            "use fewer chips or a shorter warmup"
        )
    B_w = max(64, k // 64)
    while k % B_w:
        B_w //= 2
    Y_warm = Y[:k]

    treedef, fill_mask, arrs, fills = _flatten_params(model)
    assert not arrs, "all-Fill checked above"
    fill_specs = tuple(P() for _ in fills)

    def local_fn(Y_loc, Y_warm_loc, fills_loc, x0_loc):
        from ..models.gauss_markov import GaussMarkov
        from ..models.lgssm import LGSSM

        (As_l, offs_l, Qs_l), emis_l = _rebuild(
            treedef, fill_mask, [], list(fills_loc), n_loc
        )
        m_loc = LGSSM(
            GaussMarkov(
                As=As_l, offs=offs_l, Qs=Qs_l,
                x0=Gaussian(*x0_loc), forward=True,
                det_blocks=model.trans.det_blocks,
            ),
            emis_l,
        )

        # replicated: exact f64 head + O(1) steady constants
        ld_w, gram_w, m_k, _ = bops.grams_block(
            bops._astype_tree(steady._trim(m_loc, k), hi),
            Y_warm_loc.astype(hi), w_off.astype(hi),
            n_blocks=B_w, final_state=True,
        )
        ops = steady._steady_ops(m_loc, dtype, N, n_warmup=k)
        G, K, c_w = ops["G"], ops["K"], ops["c_w"]
        A0, a0, H, h, S = ops["A0"], ops["a0"], ops["H"], ops["h"], ops["S"]

        I_R = jnp.eye(R, dtype=dtype)
        GF = jnp.kron(I_R, G)
        W_loc = Y_loc @ jnp.kron(I_R, K[:, None]).T + (
            w_off[:, None] * c_w[None, :]
        ).reshape(-1)[None, :]  # (n_loc, R*D)

        idx = jax.lax.axis_index(time_axis)
        t_loc = jnp.arange(n_loc)
        on0 = idx == 0
        m_k_flat = m_k.astype(dtype).T.reshape(-1)
        W_loc = jnp.where((on0 & (t_loc < k))[:, None], 0.0, W_loc)
        W_loc = jnp.where(
            (on0 & (t_loc == k - 1))[:, None], m_k_flat[None, :], W_loc
        )

        # pass 1: zero-start chunk reduction -> affine aggregate
        z = steady.affine_const_states(
            GF, W_loc, jnp.zeros((R * D,), dtype), block_len=block_len
        )
        v_c = z[-1]
        flag = jnp.where(on0, 0.0, 1.0)  # chip 0's start is forced to zero
        GL = _mat_pow(G, n_loc)

        all_v = jax.lax.all_gather(v_c, time_axis)      # (n_dev, R*D)
        all_f = jax.lax.all_gather(flag, time_axis)     # (n_dev,)

        def fold(x, fv):
            f, v = fv
            xk = (x.reshape(R, D) @ GL.T).reshape(-1)   # kron(I_R, G^n) x
            return f * xk + v, x

        _, excl = jax.lax.scan(
            fold, jnp.zeros((R * D,), dtype), (all_f, all_v)
        )
        x_c = jnp.where(on0, 0.0, excl[idx])

        # pass 2: exact chunk-start -> local innovations
        z2 = steady.affine_const_states(GF, W_loc, x_c, block_len=block_len)
        g = A0.T @ H
        c0 = H @ a0 + h
        Zg = jnp.kron(I_R, g[:, None])                  # (R*D, R)
        z_prev = jnp.concatenate([x_c[None], z2[:-1]], axis=0)
        E = Y_loc - z_prev @ Zg - c0 * w_off[None, :]
        val = jnp.where(on0 & (t_loc < k), 0.0, 1.0)
        E = E * val[:, None]
        gram = gram_w.astype(dtype) + jax.lax.psum(E.T @ E, time_axis) / S
        ld = ld_w.astype(dtype) + (N - k) * ops["logdetS"]
        return ld, gram

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(time_axis, None), P(), fill_specs, (P(), P())),
        out_specs=(P(), P()),
        check_rep=False,
    )
    with precision_ctx(D):
        ld, gram = fn(Y, Y_warm, tuple(fills), (x0.mean, x0.cov))
        return bops.marginalised_lml(ld, gram, P0, N, dtype)


# ---------------------------------------------------------------------------
# Distributed DTC ELBO (the sparse spatio-temporal training objective)
# ---------------------------------------------------------------------------


def _affine_pow(A, a, Q, n):
    """n-fold composition of the affine-Gaussian map x -> N(Ax + a, Q) by
    binary decomposition: log2(n) (D, D) compositions."""
    D = A.shape[-1]
    cur = (A, a, Q)
    tot = None
    m = n
    while m:
        if m & 1:
            tot = cur if tot is None else _compose_affine(tot, cur)
        cur = _compose_affine(cur, cur)
        m >>= 1
    if tot is None:  # n == 0
        return (
            jnp.eye(D, dtype=A.dtype), jnp.zeros_like(a), jnp.zeros_like(Q)
        )
    return tot


def _compose_affine(e_i, e_j):
    A_i, a_i, Q_i = e_i
    A_j, a_j, Q_j = e_j
    return (
        A_j @ A_i,
        A_j @ a_i + a_j,
        psd.symmetrize(A_j @ Q_i @ A_j.T + Q_j),
    )


def sharded_elbo(
    fx,
    y,
    z_r,
    mesh: Mesh,
    *,
    time_axis: str = "t",
    marg_engine=None,
    n_blocks: Optional[int] = None,
):
    """Distributed Titsias ELBO of a spatio-temporal DTC model — the sparse
    learning objective of BASELINE config #5 (reference:
    examples/approx_space_time_learning.jl:44-77, computed there by a
    sequential single-process filter), sharded over the time axis.

    Everything in the objective is a sum of per-step terms given the
    chunk-start states, and both start-state prefixes are O(n_dev) after an
    O(log n_local) local reduction:

      * the DATA filter chunk-reduces to one filtering element per device
        (ops/block.chunk_total_element) and one all_gather, exactly like
        sharded_logpdf — missing data handled by the usual local
        large-variance fill + volume compensation;
      * the PRIOR marginals (the q - Cf trace correction needs them) start
        from x0 propagated by the chunk's affine transition power, computed
        in log2(n_local) compositions with NO communication (all devices
        share the Fill transition, so the device prefix is just repeated
        composition of one element).

    Requires a forward all-Fill-transition model (RectilinearGrid x
    RegularSpacing DTC compilations are). y is flat space-fastest form, as
    elbo. Nt must divide by the time-axis size. Returns the scalar ELBO.
    """
    from ..gp.lti_sde import _storage_dtype, build_lgssm
    from ..models import lgssm as lgssm_mod
    from ..models import missings as missings_mod
    from ..models.gauss_markov import GaussMarkov
    from ..models.lgssm import LGSSM
    from ..space_time import grids
    from ..space_time.pseudo_point import dtcify, kernel_diagonals
    from ..utils.fill import tmaterialize

    fx_dtc = dtcify(z_r, fx)
    model = build_lgssm(fx_dtc)
    if not model.trans.forward:
        raise NotImplementedError("sharded_elbo: forward models only")
    t = model.trans
    if not (is_fill(t.As) and is_fill(t.offs) and is_fill(t.Qs)):
        raise ValueError(
            "sharded_elbo requires Fill (time-invariant) transitions — "
            "RectilinearGrid with a RegularSpacing time axis"
        )
    dtype = _storage_dtype(fx.f.storage)
    D = model.latent_dim
    x0 = t.x0

    y_tf = grids.observations_to_time_form(fx.x, jnp.asarray(y))
    Nt, Dout = y_tf.shape
    _check_divisible(Nt, mesh, time_axis)
    n_dev = mesh.shape[time_axis]
    n_loc = Nt // n_dev

    Cf_diag = kernel_diagonals(fx_dtc.f.f.kernel, fx_dtc.x, dtype)  # (Nt, Dout)
    Sigma = tmaterialize(model.emis.s_diag)  # (Nt, Dout) original noise
    treedef, fill_mask, arrs, fills = _flatten_params(model)

    arr_specs = tuple(P(time_axis) for _ in arrs)
    fill_specs = tuple(P() for _ in fills)

    def local_fn(y_loc, Cf_loc, Sig_loc, arrs_loc, fills_loc, x0_loc):
        params = _rebuild(treedef, fill_mask, list(arrs_loc), list(fills_loc), n_loc)
        (As_l, offs_l, Qs_l), emis_l = params
        x0_g = Gaussian(*x0_loc)

        # --- data term: distributed missing-filled filter ----------------
        mask = jnp.isnan(y_loc)
        Sig_filled, y_filled, n_miss = missings_mod.fill_in_missings(
            Sig_loc, y_loc
        )
        comp = missings_mod._volume_compensation(n_miss, dtype)
        emis_filled = em.replace_noise_cov(emis_l, Sig_filled)
        params_f = ((As_l, offs_l, Qs_l), emis_filled)

        agg = block.chunk_total_element(
            (params_f, y_filled), D, dtype, n_blocks=n_blocks
        )
        all_agg = jax.lax.all_gather(agg, time_axis)
        prior_el = (
            jnp.zeros((D, D), dtype),
            x0_g.mean.astype(dtype),
            psd.symmetrize(x0_g.cov).astype(dtype),
            jnp.zeros((D,), dtype),
            jnp.zeros((D, D), dtype),
        )

        def fold(c, e):
            return _combine(c, e), c

        _, excl = jax.lax.scan(fold, prior_el, all_agg)
        idx = jax.lax.axis_index(time_axis)
        start_elem = jax.tree_util.tree_map(lambda a: a[idx], excl)
        start = Gaussian(start_elem[1], start_elem[2])
        lml_loc = block.chunk_logpdf_from_start(
            (params_f, y_filled), start, D, dtype, n_blocks=n_blocks
        ) + comp

        # --- trace correction: local prior marginals ---------------------
        A_v = As_l.value if is_fill(As_l) else As_l[0]
        a_v = offs_l.value if is_fill(offs_l) else offs_l[0]
        Q_v = Qs_l.value if is_fill(Qs_l) else Qs_l[0]
        chunk_el = _affine_pow(A_v, a_v, Q_v, n_loc)
        # all devices share the element: the device prefix is a tiny local
        # scan over n_dev replicated copies — no collective needed.
        reps = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (n_dev,) + x.shape), chunk_el
        )

        def fold_aff(c, e):
            m_c, P_c = c
            A_e, a_e, Q_e = e
            return (
                (A_e @ m_c + a_e, psd.symmetrize(A_e @ P_c @ A_e.T + Q_e)),
                c,
            )

        _, excl_pri = jax.lax.scan(
            fold_aff, (x0_g.mean, psd.symmetrize(x0_g.cov)), reps
        )
        start_pri = Gaussian(excl_pri[0][idx], excl_pri[1][idx])
        model_loc = LGSSM(
            GaussMarkov(
                As=As_l, offs=offs_l, Qs=Qs_l, x0=start_pri, forward=True,
                det_blocks=model.trans.det_blocks,
            ),
            emis_l,
        )
        _, marg_v = lgssm_mod.marginals_diag(model_loc, engine=marg_engine)

        Sig_f2 = jnp.where(mask, missings_mod.LARGE_VAR, Sig_loc)
        tmp = jnp.sum((Cf_loc - marg_v) / Sig_f2) + jnp.sum(~mask)
        elbo_loc = lml_loc - 0.5 * tmp
        return jax.lax.psum(elbo_loc, time_axis)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(time_axis, None),
            P(time_axis, None),
            P(time_axis, None),
            arr_specs,
            fill_specs,
            (P(), P()),
        ),
        out_specs=P(),
        check_rep=False,
    )
    with precision_ctx(D):
        return fn(
            y_tf, Cf_diag, Sigma, tuple(arrs), tuple(fills),
            (x0.mean, x0.cov),
        )
