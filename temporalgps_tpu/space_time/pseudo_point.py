"""Pseudo-point (DTC / ELBO) approximate spatio-temporal inference.

Mirror of the reference (reference: src/space_time/pseudo_point.jl). The
state space is the inducing-point process: As = I_M (x) A_t,
Qs = K_zz (x) Q_t, with Bottleneck emissions projecting through the
M-dimensional inducing space (C = K_zz^{-1} K_zx fan-out), so all per-step
Choleskys are M*Dt- or M-dimensional regardless of the number of
observations per time slice.
"""

from typing import Any

import jax
import jax.numpy as jnp

from ..gp import kernels as K
from ..models import LGSSM, BottleneckEmissions, GaussMarkov
from ..models import lgssm as lgssm_mod
from ..models import missings as missings_mod
from ..utils import psd
from ..utils.fill import Fill, is_fill
from ..utils.gaussian import Gaussian
from ..utils.pytrees import pytree_dataclass
from ..utils.regular_spacing import num_times
from . import grids
from .separable import Separable
from .to_gauss_markov import _kron


@pytree_dataclass
class DTCSeparable(K.Kernel):
    """A Separable kernel approximated through spatial pseudo-inputs z
    (reference: pseudo_point.jl:8-11)."""

    z: Any  # (M,) or (M, Dx) spatial pseudo-input locations
    k: Separable


def dtcify(z, obj):
    """Replace Separable kernels with DTCSeparable throughout
    (reference: pseudo_point.jl:20-36)."""
    from ..gp.lti_sde import FiniteLTISDE, GP, LTISDE

    if isinstance(obj, Separable):
        return DTCSeparable(z, obj)
    if isinstance(obj, K.Scaled):
        return K.Scaled(dtcify(z, obj.kernel), obj.sigma2)
    if isinstance(obj, K.Stretched):
        return K.Stretched(dtcify(z, obj.kernel), obj.s)
    if isinstance(obj, K.Sum):
        return K.Sum(tuple(dtcify(z, c) for c in obj.kernels))
    if isinstance(obj, FiniteLTISDE):
        return FiniteLTISDE(dtcify(z, obj.f), obj.x, obj.noise)
    if isinstance(obj, LTISDE):
        return LTISDE(dtcify(z, obj.f), obj.storage)
    if isinstance(obj, GP):
        return GP(dtcify(z, obj.kernel), obj.mean)
    raise TypeError(type(obj))


# ---------------------------------------------------------------------------
# DTC state-space components
# ---------------------------------------------------------------------------

def _chol_z(space_kernel, z, dtype, eps):
    Kzz_raw = K.gram(space_kernel, z)
    # floor the reference's f64 jitter at a dtype-appropriate magnitude
    eps = jnp.maximum(
        jnp.asarray(eps, Kzz_raw.dtype),
        psd.dtype_jitter(dtype) * jnp.mean(jnp.diagonal(Kzz_raw)),
    )
    Kzz = (Kzz_raw + eps * jnp.eye(Kzz_raw.shape[0], dtype=Kzz_raw.dtype)).astype(dtype)
    return Kzz, psd.cholesky(Kzz)


def lgssm_components_dtc(kernel, x, dtype):
    """-> (As, offs, Qs, (Cs, cs, Hs, hs), x0). Handles DTCSeparable plus
    Scaled/Sum recursion (reference: pseudo_point.jl:106-179 and the 4-tuple
    emission combination in src/gp/lti_sde.jl:344-436)."""
    N = grids.n_time(x)
    if isinstance(kernel, K.Scaled):
        As, offs, Qs, (Cs, cs, Hs, hs), x0 = lgssm_components_dtc(kernel.kernel, x, dtype)
        from ..gp.lti_sde import _combine_leaves

        sigma = jnp.sqrt(jnp.asarray(kernel.sigma2, dtype))
        # Scale the *projection into observation space* (reference
        # _scale_emission_projections 4-tuple: scales Hs, hs — the projection
        # into the pseudo-point space stays fixed; pseudo_point.jl:344-346).
        Hs = _combine_leaves(lambda H: sigma * H, [Hs], N)
        hs = _combine_leaves(lambda h: sigma * h, [hs], N)
        return As, offs, Qs, (Cs, cs, Hs, hs), x0
    if isinstance(kernel, K.Sum):
        from ..gp.lti_sde import _combine_leaves

        parts = [lgssm_components_dtc(c, x, dtype) for c in kernel.kernels]
        As = _combine_leaves(lambda *ms: psd.block_diag(list(ms)), [p[0] for p in parts], N)
        offs = _combine_leaves(lambda *vs: jnp.concatenate(vs, axis=-1), [p[1] for p in parts], N)
        Qs = _combine_leaves(lambda *ms: psd.block_diag(list(ms)), [p[2] for p in parts], N)
        Cs = _combine_leaves(lambda *ms: jnp.concatenate(ms, axis=-1), [p[3][0] for p in parts], N)
        cs = _combine_leaves(lambda *vs: sum(vs), [p[3][1] for p in parts], N)
        Hs = _combine_leaves(lambda *ms: psd.block_diag(list(ms)), [p[3][2] for p in parts], N)
        hs = _combine_leaves(lambda *vs: jnp.concatenate(vs, axis=-1), [p[3][3] for p in parts], N)
        x0 = Gaussian(
            jnp.concatenate([p[4].mean for p in parts], axis=-1),
            psd.block_diag([p[4].cov for p in parts]),
        )
        return As, offs, Qs, (Cs, cs, Hs, hs), x0
    if not isinstance(kernel, DTCSeparable):
        raise TypeError(type(kernel))

    from ..gp.lti_sde import lgssm_components as temporal_lgssm_components
    from ..gp.lti_sde import _combine_leaves

    sep = kernel.k
    ts = grids.get_times(x)
    As_t, offs_t, Qs_t, (Hs_t, hs_t), x0_t = temporal_lgssm_components(sep.r, ts, dtype)

    z = kernel.z
    M = z.shape[0]
    ident_M = jnp.eye(M, dtype=dtype)

    As = _combine_leaves(lambda A: _kron(ident_M, A), [As_t], N)
    offs = _combine_leaves(lambda a: jnp.tile(a, M), [offs_t], N)
    Hs = _combine_leaves(lambda H: _kron(ident_M, H[None, :]), [Hs_t], N)
    hs = Fill(jnp.zeros(M, dtype), N)
    Kzz_x0, _ = _chol_z(sep.l, z, dtype, 0.0)
    x0 = Gaussian(
        jnp.tile(x0_t.mean, M), psd.symmetrize(_kron(Kzz_x0, x0_t.cov))
    )

    if isinstance(x, grids.RectilinearGrid):
        # (reference: pseudo_point.jl:106-142; 1e-12 jitter on K_zz)
        Kzz, Lz = _chol_z(sep.l, z, dtype, 1e-12)
        Kzx = K.gram(sep.l, z, x.xl).astype(dtype)
        C_proj = psd.chol_solve(Lz, Kzx)  # (M, Ns) = K_zz^{-1} K_zx
        Qs = _combine_leaves(lambda Q: _kron(Kzz, Q), [Qs_t], N)
        Cs = Fill(C_proj.T, N)  # (Ns, M) fan-out
        cs = _combine_leaves(lambda h: jnp.broadcast_to(h, (x.xl.shape[0],)), [hs_t], N)
    elif isinstance(x, grids.RegularInTime):
        # (reference: pseudo_point.jl:144-179; 1e-9 jitter on K_zz)
        Kzz, Lz = _chol_z(sep.l, z, dtype, 1e-9)
        Qs = _combine_leaves(lambda Q: _kron(Kzz, Q), [Qs_t], N)

        def per_time_C(v):
            Kzv = K.gram(sep.l, z, v).astype(dtype)  # (M, max_n)
            return psd.chol_solve(Lz, Kzv).T  # (max_n, M)

        Cs = jax.vmap(per_time_C)(x.vs_padded)  # (Nt, max_n, M)
        cs = _combine_leaves(lambda h: jnp.broadcast_to(h, (x.max_n,)), [hs_t], N)
    else:
        raise TypeError(type(x))
    return As, offs, Qs, (Cs, cs, Hs, hs), x0


def build_dtc_lgssm(kernel, x, noise_tf, mean_fn, dtype) -> LGSSM:
    from ..gp.means import ZeroMean

    if not isinstance(mean_fn, ZeroMean):
        raise NotImplementedError("pseudo-point inference assumes a zero mean")
    As, offs, Qs, (Cs, cs, Hs, hs), x0 = lgssm_components_dtc(kernel, x, dtype)
    emis = BottleneckEmissions(H=Hs, h=hs, C=Cs, c=cs, s_diag=noise_tf)
    from .builder import _temporal_det

    return LGSSM(
        GaussMarkov(As=As, offs=offs, Qs=Qs, x0=x0, forward=True,
                    det_blocks=_temporal_det(kernel)),
        emis,
    )


# ---------------------------------------------------------------------------
# kernel diagonals of the exact kernel (for the ELBO correction)
# ---------------------------------------------------------------------------

def kernel_diagonals(kernel, x, dtype):
    """(Nt, Dout) per-time diagonal of the *exact* kernel
    (reference: pseudo_point.jl:84-104)."""
    if isinstance(kernel, K.Scaled):
        return jnp.asarray(kernel.sigma2, dtype) * kernel_diagonals(kernel.kernel, x, dtype)
    if isinstance(kernel, K.Sum):
        return sum(kernel_diagonals(c, x, dtype) for c in kernel.kernels)
    if isinstance(kernel, DTCSeparable):
        from .separable import gram_diag_grid

        return gram_diag_grid(kernel.k, x).astype(dtype)
    raise TypeError(type(kernel))


# ---------------------------------------------------------------------------
# dtc / elbo
# ---------------------------------------------------------------------------

def dtc(fx, y, z_r, *, engine=None):
    """DTC objective = logpdf of the DTC-modified LGSSM
    (reference: pseudo_point.jl:53-55)."""
    from ..gp.lti_sde import logpdf as api_logpdf

    return api_logpdf(dtcify(z_r, fx), y, engine=engine)


def elbo(fx, y, z_r, *, engine=None, n_warmup=None, nan_fallback=True):
    """Titsias-style ELBO in state-space form
    (reference: pseudo_point.jl:62-82).

    engine="lti"/"steady" require fully-observed data: with concrete y a
    NaN raises ValueError; under jit (traced y) a runtime lax.cond falls
    back to the block engine's missing-data path when NaNs appear, so a
    jitted training loop whose data gains gaps degrades gracefully instead
    of returning NaN.

    nan_fallback=False skips that traced-NaN lax.cond: the cond compiles
    BOTH branches, and the block missing-data branch's reverse pass at
    dense-data training scale is an HBM bomb (measured: elbo+grad at
    Nt=1M, Ns=50 wanted 32.7G of 15.75G on v5e) plus most of the cold
    compile. Dense-data training loops should pass False — same contract
    as logpdf(..., nan_fallback=False)."""
    from ..gp.lti_sde import _storage_dtype, build_lgssm

    fx_dtc = dtcify(z_r, fx)
    model = build_lgssm(fx_dtc)
    dtype = _storage_dtype(fx.f.storage)

    y_tf = grids.observations_to_time_form(fx.x, jnp.asarray(y))
    mask = jnp.isnan(y_tf)

    from ..utils.fill import tmaterialize

    Sigma = tmaterialize(model.emis.s_diag)  # (Nt, Dout), original noise
    _, marg_v = lgssm_mod.marginals_diag(model, engine=engine)  # includes Sigma
    Cf_diag = kernel_diagonals(fx_dtc.f.f.kernel, fx_dtc.x, dtype)

    Sigma_filled = jnp.where(mask, missings_mod.LARGE_VAR, Sigma)
    # Reference: sum(diag(Sigma \ (Cf - marg))) - n_missing + Dout per step;
    # marg includes Sigma, so this equals sum over *observed* entries of
    # (Cf - q)/Sigma (pseudo_point.jl:76-81).
    tmp = jnp.sum((Cf_diag - marg_v) / Sigma_filled, axis=-1) + jnp.sum(~mask, axis=-1)
    if engine in ("lti", "steady"):
        # Time-invariant fast paths (ops/lti.py, ops/steady.py): require
        # fully-observed data (the large-variance missing fill would break
        # Fill-ness). Raise host-side when y is concrete; under tracing
        # (jitted training loop whose data later gains gaps) a lax.cond
        # falls back to the block engine's missing-data path at runtime —
        # the loss stays finite and exact instead of silently NaN
        # (models/missings.logpdf_with_missings applies the same guard).
        import jax
        import jax.core as _core

        # NB test the reduction, not y_tf: y closed over under jit is
        # concrete while jnp ops on it still bind to the ambient trace.
        nan_any = jnp.isnan(y_tf).any()
        if not isinstance(nan_any, _core.Tracer) and bool(nan_any):
            raise ValueError(
                f"elbo(engine={engine!r}) requires fully-observed data (no "
                "NaNs); use engine='block'/'sequential' for missing "
                "observations"
            )
        # cond disabled on TPU: see models/missings.logpdf_with_missings
        # (the compiled conditional mis-selects on v5e, round 5)
        if (isinstance(nan_any, _core.Tracer) and nan_fallback
                and jax.default_backend() != "tpu"):
            lp = jax.lax.cond(
                nan_any,
                lambda y_: missings_mod.logpdf_with_missings(
                    model, y_, engine="block"
                ),
                lambda y_: lgssm_mod.logpdf(
                    model, y_, engine=engine, n_warmup=n_warmup
                ),
                y_tf,
            )
        else:
            lp = lgssm_mod.logpdf(model, y_tf, engine=engine,
                                  n_warmup=n_warmup)
    else:
        lp = missings_mod.logpdf_with_missings(model, y_tf, engine=engine)
    return lp - 0.5 * jnp.sum(tmp)


# ---------------------------------------------------------------------------
# approximate posterior marginals at new spatial locations
# ---------------------------------------------------------------------------

def build_emission_covs(kernel: DTCSeparable, x_new, dtype):
    """Nystrom-residual spatial variance x temporal variance
    (reference: pseudo_point.jl:315-341)."""
    from ..utils.regular_spacing import time_array

    sep = kernel.k
    z = kernel.z
    Kzz, Lz = _chol_z(sep.l, z, dtype, 1e-9)
    time_vars = K.gram_diag(sep.r, time_array(grids.get_times(x_new))).astype(dtype)
    if isinstance(x_new, grids.RectilinearGrid):
        Kzx = K.gram(sep.l, z, x_new.xl).astype(dtype)
        diag_pred = K.gram_diag(sep.l, x_new.xl).astype(dtype)
        nystrom = jnp.sum(Kzx * psd.chol_solve(Lz, Kzx), axis=0)
        spatial_q = diag_pred - nystrom  # (Ns,)
        return time_vars[:, None] * spatial_q[None, :]
    if isinstance(x_new, grids.RegularInTime):
        def per_time(v):
            Kzv = K.gram(sep.l, z, v).astype(dtype)
            diag_pred = K.gram_diag(sep.l, v).astype(dtype)
            return diag_pred - jnp.sum(Kzv * psd.chol_solve(Lz, Kzv), axis=0)

        spatial_q = jax.vmap(per_time)(x_new.vs_padded)  # (Nt, max_n)
        return time_vars[:, None] * spatial_q
    raise TypeError(type(x_new))


def dtc_post_emissions(kernel, x_new, dtype):
    """(Cs, cs, Hs, hs), Sigma_diag for the prediction emissions
    (reference: pseudo_point.jl:343-364)."""
    if isinstance(kernel, K.Scaled):
        (Cs, cs, Hs, hs), Sig = dtc_post_emissions(kernel.kernel, x_new, dtype)
        from ..gp.lti_sde import _combine_leaves

        N = grids.n_time(x_new)
        sigma = jnp.sqrt(jnp.asarray(kernel.sigma2, dtype))
        Hs = _combine_leaves(lambda H: sigma * H, [Hs], N)
        hs = _combine_leaves(lambda h: sigma * h, [hs], N)
        return (Cs, cs, Hs, hs), jnp.asarray(kernel.sigma2, dtype) * Sig
    if isinstance(kernel, K.Sum):
        from ..gp.lti_sde import _combine_leaves

        N = grids.n_time(x_new)
        parts = [dtc_post_emissions(c, x_new, dtype) for c in kernel.kernels]
        Cs = _combine_leaves(lambda *ms: jnp.concatenate(ms, axis=-1), [p[0][0] for p in parts], N)
        cs = _combine_leaves(lambda *vs: sum(vs), [p[0][1] for p in parts], N)
        Hs = _combine_leaves(lambda *ms: psd.block_diag(list(ms)), [p[0][2] for p in parts], N)
        hs = _combine_leaves(lambda *vs: jnp.concatenate(vs, axis=-1), [p[0][3] for p in parts], N)
        Sig = sum(p[1] for p in parts)
        return (Cs, cs, Hs, hs), Sig
    if isinstance(kernel, DTCSeparable):
        _, _, _, proj, _ = lgssm_components_dtc(kernel, x_new, dtype)
        return proj, build_emission_covs(kernel, x_new, dtype)
    raise TypeError(type(kernel))


def approx_posterior_marginals_at(fx, y, z_r, x_r, t: int, *, engine=None):
    """DTC posterior marginals at spatial locations x_r for the single time
    index t (reference: pseudo_point.jl:258-288): predictions elsewhere use a
    single dummy point per slice, and only slice t is returned."""
    ts = grids.get_times(fx.x)
    Nt = num_times(ts)
    if t < 0 or t >= Nt:
        raise ValueError(f"t = {t} must be in [0, {Nt})")
    import numpy as np

    from ..utils.regular_spacing import time_array

    x_r = jnp.asarray(x_r)
    vs = [np.asarray(x_r[:1]) for _ in range(Nt)]
    vs[t] = np.asarray(x_r)
    x_pr = grids.regular_in_time(np.asarray(time_array(ts)), vs)
    m, v = approx_posterior_marginals(fx, y, z_r, x_pr, engine=engine)
    start = sum(x_pr.counts[:t])
    n = x_pr.counts[t]
    return m[start : start + n], v[start : start + n]


def approx_posterior_marginals(fx, y, z_r, x_r, *, engine=None,
                               n_warmup=None):
    """DTC posterior marginals at new spatial locations x_r, all times
    (reference: pseudo_point.jl:222-241). Returns flat (means, vars)."""
    from ..gp.lti_sde import _storage_dtype, build_lgssm

    dtype = _storage_dtype(fx.f.storage)
    fx_dtc = dtcify(z_r, fx)
    model = build_lgssm(fx_dtc)
    y_tf = grids.observations_to_time_form(fx.x, jnp.asarray(y))

    if isinstance(x_r, (grids.RectilinearGrid, grids.RegularInTime)):
        x_pr = x_r
    else:
        x_pr = grids.RectilinearGrid(jnp.asarray(x_r), grids.get_times(fx.x))
    k_dtc = dtcify(z_r, fx.f.f.kernel)
    (Cs, cs, Hs, hs), Sig = dtc_post_emissions(k_dtc, x_pr, dtype)
    new_emis = BottleneckEmissions(H=Hs, h=hs, C=Cs, c=cs, s_diag=Sig)

    if engine == "steady":
        # Fill fast path: steady RTS smoother with the prediction emissions
        # projected segment-wise — never materialises the (N, D, D)
        # reversed-dynamics chain. Fully-observed data only.
        import jax.core as _core

        from ..ops import steady

        nan_any = jnp.isnan(y_tf).any()
        if not isinstance(nan_any, _core.Tracer) and bool(nan_any):
            raise ValueError(
                "approx_posterior_marginals(engine='steady') requires "
                "fully-observed data (no NaNs)"
            )
        m, v = steady.posterior_marginals_diag(model, y_tf, emis=new_emis,
                                               n_warmup=n_warmup)
        return grids.destructure(x_pr, m), grids.destructure(x_pr, v)

    post = missings_mod.posterior_with_missings(model, y_tf, engine=engine)
    new_model = LGSSM(post.trans, new_emis)
    m, v = lgssm_mod.marginals_diag(new_model, engine=engine)
    return grids.destructure(x_pr, m), grids.destructure(x_pr, v)
