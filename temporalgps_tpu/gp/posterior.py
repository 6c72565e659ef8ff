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


def _same_inputs(x1, x2) -> bool:
    t1 = np.asarray(time_array(x1))
    t2 = np.asarray(time_array(x2))
    return t1.shape == t2.shape and bool(np.all(t1 == t2))


def _build_inference_data(fp: PosteriorLTISDE, x_pr):
    """Merged, time-sorted (x, noise, y-with-NaNs, tr_idx, pr_idx)
    (reference: posterior_lti_sde.jl:87-131)."""
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


def _posterior_model(fp, x_sorted, noise_all, y_all, noise_pred_full, *, engine=None):
    model = build_lgssm(fp.prior(x_sorted, noise_all))
    post = missings_mod.posterior_with_missings(model, y_all, engine=engine)
    return missings_mod.replace_observation_noise_cov(post, noise_pred_full)


def _pred_noise_full(pr_idx, N, noise_pr, dtype):
    """Zeros at training indices, prediction noise at prediction indices
    (reference: posterior_lti_sde.jl:136-146)."""
    out = jnp.zeros((N,), dtype)
    return out.at[jnp.asarray(pr_idx)].set(_noise_array(noise_pr, len(pr_idx)))


def marginals(fxp: FinitePosteriorLTISDE, *, engine=None):
    """Posterior marginal (means, vars) at fxp.x
    (reference: posterior_lti_sde.jl:18-37)."""
    fp = fxp.f
    dtype = _storage_dtype(fp.prior.storage)
    if _same_inputs(fxp.x, fp.x):
        model = build_lgssm(fp.prior(fp.x, fp.noise))
        post = missings_mod.posterior_with_missings(model, fp.y, engine=engine)
        post = missings_mod.replace_observation_noise_cov(
            post, _noise_array(fxp.noise, num_times(fxp.x))
        )
        return lgssm_mod.marginals_diag(post, engine=engine)
    x_sorted, noise_all, y_all, tr_idx, pr_idx = _build_inference_data(fp, fxp.x)
    noise_pred_full = _pred_noise_full(pr_idx, len(x_sorted), fxp.noise, dtype)
    post = _posterior_model(fp, x_sorted, noise_all, y_all, noise_pred_full, engine=engine)
    m, v = lgssm_mod.marginals_diag(post, engine=engine)
    idx = jnp.asarray(pr_idx)
    return m[idx], v[idx]


def mean_and_var(fxp, *, engine=None):
    return marginals(fxp, engine=engine)


def mean(fxp, *, engine=None):
    return marginals(fxp, engine=engine)[0]


def var(fxp, *, engine=None):
    return marginals(fxp, engine=engine)[1]


def rand(key, fxp: FinitePosteriorLTISDE, *, engine=None):
    """Joint posterior sample at fxp.x (reference: posterior_lti_sde.jl:48-58)."""
    fp = fxp.f
    dtype = _storage_dtype(fp.prior.storage)
    x_sorted, noise_all, y_all, tr_idx, pr_idx = _build_inference_data(fp, fxp.x)
    noise_pred_full = _pred_noise_full(pr_idx, len(x_sorted), fxp.noise, dtype)
    post = _posterior_model(fp, x_sorted, noise_all, y_all, noise_pred_full, engine=engine)
    ys = lgssm_mod.rand(key, post, engine=engine)
    return ys[jnp.asarray(pr_idx)]


def logpdf(fxp: FinitePosteriorLTISDE, y_pr, *, engine=None):
    """Posterior predictive logpdf (reference: posterior_lti_sde.jl:62-78)."""
    fp = fxp.f
    dtype = _storage_dtype(fp.prior.storage)
    x_sorted, noise_all, y_all, tr_idx, pr_idx = _build_inference_data(fp, fxp.x)
    noise_pred_full = _pred_noise_full(pr_idx, len(x_sorted), fxp.noise, dtype)
    post = _posterior_model(fp, x_sorted, noise_all, y_all, noise_pred_full, engine=engine)
    # Observations for the reverse model: y_pr at prediction indices,
    # missing (NaN) at training indices.
    y_full = jnp.full((len(x_sorted),), jnp.nan, dtype)
    y_full = y_full.at[jnp.asarray(pr_idx)].set(jnp.asarray(y_pr, dtype))
    return missings_mod.logpdf_with_missings(post, y_full, engine=engine)
