"""Missing-data handling.

The reference's adopted strategy — replace missing observations with
arbitrary values and *large* observation noise, then subtract the volume
compensation from the lml (reference: src/models/missings.jl:1-6, 43-53) —
is also exactly the right strategy under jit: static shapes, no dynamic
gather/scatter, pure elementwise selects.

Missing observations are encoded as NaN in `y`. `prepare_missings` turns a
(model, y-with-NaNs) pair into (model-with-inflated-noise, y-zero-filled,
compensation) where

    compensation = (#missing scalar observations) * log(2*pi*1e15) / 2
"""

import jax.numpy as jnp

from ..config import LARGE_VAR
from ..utils.fill import is_fill
from . import emissions as em
from .lgssm import LGSSM


def _volume_compensation(n_missing, dtype):
    return n_missing * jnp.log(2 * jnp.pi * jnp.asarray(LARGE_VAR, dtype)) / 2


def fill_in_missings(noise, y):
    """Inflate noise and zero-fill observations where y is NaN.

    noise: per-step noise leaf — (N,) scalar variances, (N, Dout) diagonals,
    or (N, Dout, Dout) dense matrices (inflated on the diagonal, off-diagonal
    rows/cols of missing entries zeroed).
    Returns (noise_filled, y_filled, n_missing).
    """
    mask = jnp.isnan(y)  # True = missing
    y_filled = jnp.where(mask, 0.0, y)
    n_missing = jnp.sum(mask)
    if noise.ndim == y.ndim:  # scalar or diagonal representation
        noise_filled = jnp.where(mask, jnp.asarray(LARGE_VAR, noise.dtype), noise)
    else:  # dense (N, Dout, Dout)
        keep = (~mask)[..., :, None] & (~mask)[..., None, :]
        noise_filled = jnp.where(keep, noise, 0.0)
        diag_fill = jnp.where(
            mask, jnp.asarray(LARGE_VAR, noise.dtype),
            jnp.diagonal(noise, axis1=-2, axis2=-1),
        )
        idx = jnp.arange(noise.shape[-1])
        noise_filled = noise_filled.at[..., idx, idx].set(diag_fill)
    return noise_filled, y_filled, n_missing


def replace_observation_noise_cov(model: LGSSM, new_noise) -> LGSSM:
    """Swap the per-step observation noise leaf
    (reference: src/models/missings.jl:35-41)."""
    return LGSSM(model.trans, em.replace_noise_cov(model.emis, new_noise))


def transform_model_and_obs(model: LGSSM, y):
    """(model', y', compensation) with missing entries marginalised out
    (reference: src/models/missings.jl:25-33, 45-53)."""
    noise = em.noise_cov(model.emis)
    if is_fill(noise):
        # Materialise only the noise leaf (lazy broadcast under jit); other
        # emission leaves stay Fill so the scan engines keep O(1) traffic.
        noise = jnp.broadcast_to(noise.value, (noise.N,) + jnp.shape(noise.value))
    noise_filled, y_filled, n_missing = fill_in_missings(noise, y)
    comp = _volume_compensation(n_missing, y_filled.dtype)
    return replace_observation_noise_cov(model, noise_filled), y_filled, comp


def logpdf_with_missings(model: LGSSM, y, *, engine=None, nan_fallback=True,
                         **engine_kwargs):
    from .lgssm import logpdf

    if engine in ("lti", "steady"):
        # These engines require fully-observed data AND Fill (time-
        # invariant) noise; the missing-data transform materialises the
        # noise leaf, which would break their premise even for NaN-free
        # data. With concrete y a NaN raises loudly. Under jit (traced y —
        # e.g. a training loop whose data later gains gaps) the host check
        # is impossible, so by default a lax.cond falls back to the block
        # engine's missing-data path when NaNs appear at runtime: the loss
        # stays finite and exact instead of silently NaN. The fallback
        # branch costs extra compile time; nan_fallback=False restores the
        # NaN-propagating contract.
        import jax

        y = jnp.asarray(y)
        # NB test the reduction, not y: y closed over under jit is concrete
        # while jnp ops on it still bind to the ambient trace.
        nan_any = jnp.isnan(y).any()
        if not isinstance(nan_any, jax.core.Tracer):
            if bool(nan_any):
                raise ValueError(
                    f"engine={engine!r} requires fully-observed data (no "
                    "NaNs); use engine='block'/'sequential' for missing data"
                )
            return logpdf(model, y, engine=engine, **engine_kwargs)
        # The both-branch cond is DISABLED on TPU regardless of
        # nan_fallback: beyond doubling compile and reverse-mode HBM, the
        # compiled conditional returned a value matching NEITHER branch on
        # v5e with NaN-free data (round 5, probes/tpu_smoke.py g1:
        # -38442.57 vs both branches' correct -38480.73) — an XLA:TPU
        # miscompilation class we route around like the others
        # (docs/ROADMAP.md round-5 finding). On TPU, missing data under
        # jit must use engine='block'/'sequential' explicitly; NaNs
        # propagate loudly otherwise.
        if nan_fallback and jax.default_backend() != "tpu":
            def fast(y_):
                return logpdf(model, y_, engine=engine, **engine_kwargs)

            def safe(y_):
                m_f, y_f, comp = transform_model_and_obs(model, y_)
                return logpdf(m_f, y_f, engine="block") + comp

            return jax.lax.cond(nan_any, safe, fast, y)
        return logpdf(model, y, engine=engine, **engine_kwargs)
    model_f, y_f, comp = transform_model_and_obs(model, y)
    return logpdf(model_f, y_f, engine=engine, **engine_kwargs) + comp


def posterior_with_missings(model: LGSSM, y, *, engine=None):
    from .lgssm import posterior

    model_f, y_f, _ = transform_model_and_obs(model, y)
    return posterior(model_f, y_f, engine=engine)


def filter_with_missings(model: LGSSM, y, *, engine=None):
    from .lgssm import filter_

    model_f, y_f, _ = transform_model_and_obs(model, y)
    return filter_(model_f, y_f, engine=engine)
