"""PosteriorLTISDE — lazy exact posterior GP with state-space prediction.

Mirror of the reference's posterior layer (reference:
src/gp/posterior_lti_sde.jl). A posterior is stored lazily as (prior, data);
predictions at new time points merge training and prediction inputs, sort
them in time, mark prediction points as missing with large observation
variance, run the forward filter + backward smoother, and slice out the
prediction indices (reference: build_inference_data :87-131).

The merge/sort/index bookkeeping is host-side NumPy on concrete inputs (it is
data preparation, not compute); the filter/smoother scans remain jittable.
The reference intentionally refuses to compute the dense posterior covariance
(posterior_lti_sde.jl:14-16) — so do we.
"""

import numpy as np

import jax

import jax.numpy as jnp

from ..config import LARGE_VAR
from ..models import lgssm as lgssm_mod
from ..models import missings as missings_mod
from ..utils.fill import Fill, is_fill
from ..utils.pytrees import pytree_dataclass
from ..utils.regular_spacing import num_times, time_array
from .lti_sde import FiniteLTISDE, LTISDE, build_lgssm, _canon_noise, _storage_dtype


@pytree_dataclass
class PosteriorLTISDE:
    prior: LTISDE
    y: jnp.ndarray
    x: object
    noise: object

    def __call__(self, x_pr, noise=None):
        return FinitePosteriorLTISDE(
            self, x_pr, _canon_noise(noise, x_pr, _storage_dtype(self.prior.storage))
        )


def posterior(fx: FiniteLTISDE, y) -> PosteriorLTISDE:
    """Lazy posterior (reference: posterior_lti_sde.jl:7-10)."""
    return PosteriorLTISDE(fx.f, jnp.asarray(y), fx.x, fx.noise)


@pytree_dataclass
class FinitePosteriorLTISDE:
    f: PosteriorLTISDE
    x: object
    noise: object


def _noise_array(noise, N):
    if is_fill(noise):
        return jnp.broadcast_to(noise.value, (N,))
    return jnp.asarray(noise)


def _is_grid(x) -> bool:
    from ..space_time import grids

    return isinstance(x, (grids.RectilinearGrid, grids.RegularInTime))


def _times_of(x):
    from ..space_time import grids

    if _is_grid(x):
        return np.asarray(time_array(grids.get_times(x)))
    return np.asarray(time_array(x))


def _same_inputs(x1, x2) -> bool:
    if x1 is x2:
        return True
    try:
        return _same_inputs_concrete(x1, x2)
    except jax.errors.TracerArrayConversionError:
        # Under jit the time values are tracers: only identical input
        # objects can be recognised as "same"; merging new prediction points
        # needs concrete inputs (it is host-side data preparation).
        return False


def _same_inputs_concrete(x1, x2) -> bool:
    if _is_grid(x1) != _is_grid(x2):
        return False
    if _is_grid(x1):
        from ..space_time import grids

        if not isinstance(x1, grids.RectilinearGrid) or not isinstance(
            x2, grids.RectilinearGrid
        ):
            return False
        s1, s2 = np.asarray(x1.xl), np.asarray(x2.xl)
        if s1.shape != s2.shape or not np.all(s1 == s2):
            return False
    t1, t2 = _times_of(x1), _times_of(x2)
    return t1.shape == t2.shape and bool(np.all(t1 == t2))


def _build_inference_data_grid(fp: PosteriorLTISDE, x_pr):
    """Grid variant: merge along time only — the spatial grids must agree, as
    in the reference (reference: rectilinear_grid.jl:64-69 merge_inputs).
    Index arrays refer to flat (space-fastest) positions."""
    from ..space_time import grids

    assert isinstance(fp.x, grids.RectilinearGrid) and isinstance(
        x_pr, grids.RectilinearGrid
    ), "grid posterior prediction requires RectilinearGrid inputs"
    s_tr, s_pr = np.asarray(fp.x.xl), np.asarray(x_pr.xl)
    if s_tr.shape != s_pr.shape or not np.all(s_tr == s_pr):
        raise ValueError("Space coords of inputs not compatible, cannot merge.")
    Ns = s_tr.shape[0]
    t_tr, t_pr = _times_of(fp.x), _times_of(x_pr)
    nt_tr, nt_pr = len(t_tr), len(t_pr)
    t_all = np.concatenate([t_tr, t_pr])
    order = np.argsort(t_all, kind="stable")
    rank = np.argsort(order, kind="stable")
    # flat (space-fastest) index blocks per time slice
    flat_of_time = lambda ranks: np.concatenate(
        [np.arange(Ns) + r * Ns for r in ranks]
    )
    tr_idx = flat_of_time(rank[:nt_tr])
    pr_idx = flat_of_time(rank[nt_tr:])

    x_sorted = grids.RectilinearGrid(fp.x.xl, jnp.asarray(t_all[order]))
    n_tr_flat = nt_tr * Ns
    noise_tr = _noise_array(fp.noise, n_tr_flat)
    noise_all_flat = jnp.zeros((len(t_all) * Ns,), noise_tr.dtype)
    noise_all_flat = noise_all_flat.at[jnp.asarray(tr_idx)].set(noise_tr)
    noise_all_flat = noise_all_flat.at[jnp.asarray(pr_idx)].set(LARGE_VAR)
    y_tr = jnp.asarray(fp.y)
    y_all_flat = jnp.full((len(t_all) * Ns,), jnp.nan, y_tr.dtype)
    y_all_flat = y_all_flat.at[jnp.asarray(tr_idx)].set(y_tr)
    return x_sorted, noise_all_flat, y_all_flat, tr_idx, pr_idx


def _build_inference_data(fp: PosteriorLTISDE, x_pr):
    """Merged, time-sorted (x, noise, y-with-NaNs, tr_idx, pr_idx)
    (reference: posterior_lti_sde.jl:87-131)."""
    if _is_grid(fp.x) or _is_grid(x_pr):
        return _build_inference_data_grid(fp, x_pr)
    t_tr = np.asarray(time_array(fp.x))
    t_pr = np.asarray(time_array(x_pr))
    n_tr, n_pr = len(t_tr), len(t_pr)
    t_all = np.concatenate([t_tr, t_pr])
    order = np.argsort(t_all, kind="stable")
    rank = np.argsort(order, kind="stable")
    tr_idx = rank[:n_tr]
    pr_idx = rank[n_tr:]

    noise_tr = _noise_array(fp.noise, n_tr)
    noise_all = jnp.concatenate(
        [noise_tr, jnp.full((n_pr,), LARGE_VAR, noise_tr.dtype)]
    )[order]
    y_all = jnp.concatenate(
        [jnp.asarray(fp.y), jnp.full((n_pr,), jnp.nan, jnp.asarray(fp.y).dtype)]
    )[order]
    x_sorted = jnp.asarray(t_all[order])
    return x_sorted, noise_all, y_all, tr_idx, pr_idx


def _to_time_form(x, y):
    if _is_grid(x):
        from ..space_time import grids

        return grids.observations_to_time_form(x, y)
    return y


def _noise_time_form(x, noise_flat):
    if _is_grid(x):
        from ..space_time import grids

        return grids.noise_var_to_time_form(x, noise_flat)
    return noise_flat


def _destructure(x, ys):
    if _is_grid(x):
        from ..space_time import grids

        return grids.destructure(x, ys)
    return ys


def _flat_len(x) -> int:
    if _is_grid(x):
        from ..space_time import grids

        return grids.flat_len(x)
    return num_times(x)


def _noise_leaf_like(model, x, noise_flat):
    """Time-form noise in the representation the model's emissions use
    (dense per-time matrices for grid DenseEmissions, flat for scalar)."""
    from ..models.emissions import DenseEmissions

    tf = _noise_time_form(x, noise_flat)
    if isinstance(model.emis, DenseEmissions):
        return tf[..., None] * jnp.eye(tf.shape[-1], dtype=tf.dtype)
    return tf


def _posterior_model(fp, x_sorted, noise_all, y_all, noise_pred_full, *, engine=None):
    model = build_lgssm(fp.prior(x_sorted, noise_all))
    y_tf = _to_time_form(x_sorted, y_all)
    post = missings_mod.posterior_with_missings(model, y_tf, engine=engine)
    return missings_mod.replace_observation_noise_cov(
        post, _noise_leaf_like(model, x_sorted, noise_pred_full)
    )


def _pred_noise_full(pr_idx, n_flat, noise_pr, dtype):
    """Zeros at training indices, prediction noise at prediction indices
    (reference: posterior_lti_sde.jl:136-146). Flat form."""
    out = jnp.zeros((n_flat,), dtype)
    return out.at[jnp.asarray(pr_idx)].set(_noise_array(noise_pr, len(pr_idx)))


def marginals(fxp: FinitePosteriorLTISDE, *, engine=None):
    """Posterior marginal (means, vars) at fxp.x, flat form
    (reference: posterior_lti_sde.jl:18-37)."""
    fp = fxp.f
    dtype = _storage_dtype(fp.prior.storage)
    if _same_inputs(fxp.x, fp.x):
        from .lti_sde import _route_kron

        fx_tr = fp.prior(fp.x, fp.noise)
        if _route_kron(fx_tr, engine):
            from ..space_time import grids as _grids
            from ..space_time import kron

            noise_pr = _grids.noise_var_to_time_form(
                fxp.x, _noise_array(fxp.noise, _flat_len(fxp.x))
            )
            m, v = kron.posterior_marginals(fx_tr, fp.y, noise_pred=noise_pr)
            return _destructure(fxp.x, m), _destructure(fxp.x, v)
        model = build_lgssm(fx_tr)
        post = missings_mod.posterior_with_missings(
            model, _to_time_form(fp.x, fp.y), engine=engine
        )
        post = missings_mod.replace_observation_noise_cov(
            post,
            _noise_leaf_like(model, fxp.x, _noise_array(fxp.noise, _flat_len(fxp.x))),
        )
        m, v = lgssm_mod.marginals_diag(post, engine=engine)
        return _destructure(fxp.x, m), _destructure(fxp.x, v)
    x_sorted, noise_all, y_all, tr_idx, pr_idx = _build_inference_data(fp, fxp.x)
    noise_pred_full = _pred_noise_full(pr_idx, _flat_len(x_sorted), fxp.noise, dtype)
    if _is_grid(x_sorted):
        # Prediction slices on the merged grid are whole-row missing steps
        # (y = NaN -> large-variance fill), which the factored kron filter
        # already handles — so new-times prediction keeps the factored
        # engine instead of re-entering the materialised D=Ns*Dt path the
        # kron engine exists to avoid.
        from .lti_sde import _route_kron

        fx_merged = fp.prior(x_sorted, noise_all)
        if _route_kron(fx_merged, engine):
            from ..space_time import grids as _grids
            from ..space_time import kron

            noise_pr_tf = _grids.noise_var_to_time_form(x_sorted, noise_pred_full)
            m, v = kron.posterior_marginals(fx_merged, y_all, noise_pred=noise_pr_tf)
            idx = jnp.asarray(pr_idx)
            return _destructure(x_sorted, m)[idx], _destructure(x_sorted, v)[idx]
    post = _posterior_model(fp, x_sorted, noise_all, y_all, noise_pred_full, engine=engine)
    m, v = lgssm_mod.marginals_diag(post, engine=engine)
    idx = jnp.asarray(pr_idx)
    return _destructure(x_sorted, m)[idx], _destructure(x_sorted, v)[idx]


def mean_and_var(fxp, *, engine=None):
    return marginals(fxp, engine=engine)


def mean(fxp, *, engine=None):
    return marginals(fxp, engine=engine)[0]


def var(fxp, *, engine=None):
    return marginals(fxp, engine=engine)[1]


def cov(fxp: FinitePosteriorLTISDE):
    """Intentionally not implemented, as in the reference
    (posterior_lti_sde.jl:14-16): the dense posterior covariance is O(N^2)
    memory and defeats the purpose of the state-space representation."""
    raise NotImplementedError(
        "Intentionally not implemented. Please don't try to explicitly "
        "compute this covariance matrix."
    )


def rand(key, fxp: FinitePosteriorLTISDE, *, engine=None):
    """Joint posterior sample at fxp.x, flat form
    (reference: posterior_lti_sde.jl:48-58)."""
    fp = fxp.f
    dtype = _storage_dtype(fp.prior.storage)
    x_sorted, noise_all, y_all, tr_idx, pr_idx = _build_inference_data(fp, fxp.x)
    noise_pred_full = _pred_noise_full(pr_idx, _flat_len(x_sorted), fxp.noise, dtype)
    post = _posterior_model(fp, x_sorted, noise_all, y_all, noise_pred_full, engine=engine)
    ys = _destructure(x_sorted, lgssm_mod.rand(key, post, engine=engine))
    return ys[jnp.asarray(pr_idx)]


def logpdf(fxp: FinitePosteriorLTISDE, y_pr, *, engine=None):
    """Posterior predictive logpdf (reference: posterior_lti_sde.jl:62-78)."""
    fp = fxp.f
    dtype = _storage_dtype(fp.prior.storage)
    x_sorted, noise_all, y_all, tr_idx, pr_idx = _build_inference_data(fp, fxp.x)
    noise_pred_full = _pred_noise_full(pr_idx, _flat_len(x_sorted), fxp.noise, dtype)
    post = _posterior_model(fp, x_sorted, noise_all, y_all, noise_pred_full, engine=engine)
    # Observations for the reverse model: y_pr at prediction indices,
    # missing (NaN) at training indices.
    y_full = jnp.full((_flat_len(x_sorted),), jnp.nan, dtype)
    y_full = y_full.at[jnp.asarray(pr_idx)].set(jnp.asarray(y_pr, dtype))
    return missings_mod.logpdf_with_missings(
        post, _to_time_form(x_sorted, y_full), engine=engine
    )
