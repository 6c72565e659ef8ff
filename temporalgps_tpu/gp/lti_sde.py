"""to_sde and the kernel -> LGSSM compiler — the public API layer.

Mirror of the reference's L4 (reference: src/gp/lti_sde.jl): a `GP` wrapped by
`to_sde` becomes an `LTISDE`; indexing it at inputs with observation noise
gives a `FiniteLTISDE`; `build_lgssm` compiles kernel + inputs into the L3
`LGSSM` on which all inference runs.

Compilation strategy (TPU-first):
  * `RegularSpacing` inputs -> a single shared (A, Q) wrapped in `Fill`s —
    O(1) parameter memory, the reference's time-invariant fast path
    (reference: src/gp/lti_sde.jl:148-160).
  * irregular inputs -> batched closed-form transitions over dt (one fused
    vmap, no per-step expm), (reference path: src/gp/lti_sde.jl:135-146,
    which calls a generic matrix exponential per step).
"""

import dataclasses
from typing import Any

import jax.numpy as jnp

from ..config import DEFAULT_NOISE
from ..models import LGSSM, GaussMarkov, ScalarEmissions
from ..models import lgssm as lgssm_mod
from ..models import missings as missings_mod
from ..utils import psd
from ..utils.fill import Fill, is_fill, tmaterialize
from ..utils.gaussian import Gaussian
from ..utils.pytrees import pytree_dataclass
from ..utils.regular_spacing import RegularSpacing, num_times, time_array
from . import kernels as K
from .means import ConstMean, CustomMean, ZeroMean, mean_vector


# ---------------------------------------------------------------------------
# Storage types (API parity shims)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ArrayStorage:
    """Dense-array storage tag (reference: src/util/storage_types.jl:42-48).
    Under jit every shape is static, so the only payload is the dtype."""

    dtype: Any = jnp.float64


@dataclasses.dataclass(frozen=True)
class SArrayStorage:
    """Static-array storage tag (reference: src/util/storage_types.jl:28-34).
    Equivalent to ArrayStorage under XLA (all shapes are compile-time static);
    kept for API parity and benchmark-variant naming."""

    dtype: Any = jnp.float64


def _storage_dtype(storage):
    if storage is None:
        return jnp.float64
    if isinstance(storage, (ArrayStorage, SArrayStorage)):
        return storage.dtype
    return storage  # raw dtype


# ---------------------------------------------------------------------------
# GP / LTISDE / FiniteLTISDE
# ---------------------------------------------------------------------------

@pytree_dataclass
class GP:
    kernel: Any
    mean: Any = ZeroMean()


@pytree_dataclass(static_fields=("storage",))
class LTISDE:
    """A GP marked for state-space inference (reference: src/gp/lti_sde.jl:7-14)."""

    f: GP
    storage: Any = ArrayStorage()

    def __call__(self, x, noise=None):
        return FiniteLTISDE(self, x, _canon_noise(noise, x, _storage_dtype(self.storage)))


def to_sde(f: GP, storage=None) -> LTISDE:
    return LTISDE(f, storage if storage is not None else ArrayStorage())


def _canon_noise(noise, x, dtype):
    """Canonical per-observation variance: Fill for scalar noise, flat array
    otherwise. Default 1e-12 (reference: src/gp/lti_sde.jl:27-29)."""
    N = _flat_len(x)
    if noise is None:
        return Fill(jnp.asarray(DEFAULT_NOISE, dtype), N)
    if is_fill(noise):
        return noise
    noise = jnp.asarray(noise, dtype)
    if noise.ndim == 0:
        return Fill(noise, N)
    return noise


def _flat_len(x) -> int:
    if _is_grid(x):
        from ..space_time import grids

        return grids.flat_len(x)
    return num_times(x)


def _is_grid(x) -> bool:
    from ..space_time import grids

    return isinstance(x, (grids.RectilinearGrid, grids.RegularInTime))


@pytree_dataclass
class FiniteLTISDE:
    f: LTISDE
    x: Any       # RegularSpacing or (N,) array of times
    noise: Any   # per-time observation variance: Fill or (N,) array

    def __len__(self):
        return num_times(self.x)


# ---------------------------------------------------------------------------
# kernel -> LGSSM components
# ---------------------------------------------------------------------------

def _combine_leaves(fn, leaves, N):
    """Apply a per-step function across a list of per-step leaves, staying
    lazy when all inputs are Fill."""
    if all(is_fill(l) for l in leaves):
        return Fill(fn(*[l.value for l in leaves]), N)
    import jax

    mat = [
        jnp.broadcast_to(l.value, (l.N,) + jnp.shape(l.value)) if is_fill(l) else l
        for l in leaves
    ]
    return jax.vmap(fn)(*mat)


def broadcast_components(atoms: K.SDEAtoms, x, dtype, det: bool = False):
    """Discretise the SDE over the time grid
    (reference: src/gp/lti_sde.jl:135-160).

    The discretisation Q = P_inf - A P_inf A^T cancels catastrophically at
    small dt, so it is always evaluated in float64 and then cast to the
    storage dtype — the float32 storage path keeps a float64-accurate model,
    like the reference's heapF32/stackF32 variants which discretise in the
    storage type but with exact expm (bench/single_output_gps.jl).
    """
    hi = jnp.float64
    P = psd.symmetrize(atoms.P_inf).astype(hi)
    D = P.shape[-1]
    N = num_times(x)
    # f32 storage: floor the process noise at a dtype-scaled fraction of the
    # stationary covariance. Deterministic blocks (Cosine/Constant/
    # ApproxPeriodic rotations) have Q = 0 exactly; in f32 the recursion's
    # per-step round-off (~1e-7 |P|) then accumulates with nothing to damp
    # it and the filter covariance drifts indefinite — measured: EVERY
    # engine NaNs on a Matern+ApproxPeriodic sum at N=1e6 f32. A floor of
    # 1e-5 P_inf dominates the round-off while perturbing the model far
    # below f32 observation accuracy. Applied ONLY to deterministic atoms
    # (det=True, per Sum child) so Matern-family f32 models keep the exact
    # discretised Q; f64 storage is always exact.
    q_floor = (
        0.0 if (jnp.dtype(dtype).itemsize >= 8 or not det) else 1e-5
    )
    if isinstance(x, RegularSpacing):
        A = atoms.transition(jnp.asarray(x.dt, hi)).astype(hi)
        Q = psd.symmetrize(P - A @ P @ A.T) + q_floor * P
        As = Fill(A.astype(dtype), N)
        Qs = Fill(Q.astype(dtype), N)
    else:
        t = jnp.asarray(x, hi)
        # The reference prepends t0 - 1 so the first step has dt = 1; by
        # stationarity any first dt yields the same first marginal
        # (reference: src/gp/lti_sde.jl:140).
        dts = jnp.concatenate([jnp.ones((1,), hi), jnp.diff(t)])
        As_hi = atoms.transition(dts).astype(hi)  # (N, D, D) in one fused batch
        Qs = (
            psd.symmetrize(P - As_hi @ P @ jnp.swapaxes(As_hi, -1, -2))
            + q_floor * P
        ).astype(dtype)
        As = As_hi.astype(dtype)
    offs = Fill(jnp.zeros(D, dtype), N)
    Hs = Fill(atoms.H.astype(dtype), N)
    hs = Fill(jnp.zeros((), dtype), N)
    return As, offs, Qs, Hs, hs


def lgssm_components(kernel, x, dtype):
    """Recursive kernel compiler -> (As, offs, Qs, (Hs, hs), x0)
    (reference: src/gp/lti_sde.jl:112-174, 334-436)."""
    N = num_times(x)
    if isinstance(kernel, K.Sum):
        parts = [lgssm_components(c, x, dtype) for c in kernel.kernels]
        As = _combine_leaves(lambda *ms: psd.block_diag(list(ms)), [p[0] for p in parts], N)
        offs = _combine_leaves(
            lambda *vs: jnp.concatenate(vs, axis=-1), [p[1] for p in parts], N
        )
        Qs = _combine_leaves(lambda *ms: psd.block_diag(list(ms)), [p[2] for p in parts], N)
        Hs = _combine_leaves(
            lambda *vs: jnp.concatenate(vs, axis=-1), [p[3][0] for p in parts], N
        )
        hs = _combine_leaves(lambda *vs: sum(vs), [p[3][1] for p in parts], N)
        x0 = Gaussian(
            jnp.concatenate([p[4].mean for p in parts], axis=-1),
            psd.block_diag([p[4].cov for p in parts]),
        )
        return As, offs, Qs, (Hs, hs), x0
    if isinstance(kernel, K.Scaled):
        As, offs, Qs, (Hs, hs), x0 = lgssm_components(kernel.kernel, x, dtype)
        sigma = jnp.sqrt(jnp.asarray(kernel.sigma2, dtype))
        Hs = _combine_leaves(lambda H: sigma * H, [Hs], N)
        hs = _combine_leaves(lambda h: sigma * h, [hs], N)
        return As, offs, Qs, (Hs, hs), x0
    if isinstance(kernel, K.Stretched):
        x_st = (
            x.stretch(jnp.asarray(kernel.s, dtype))
            if isinstance(x, RegularSpacing)
            else jnp.asarray(kernel.s, dtype) * jnp.asarray(x, dtype)
        )
        return lgssm_components(kernel.kernel, x_st, dtype)
    # Atoms are always built in float64 (discretisation accuracy); the
    # storage dtype is applied by broadcast_components.
    atoms = K.sde_atoms(kernel, jnp.float64)
    As, offs, Qs, Hs, hs = broadcast_components(
        atoms, x, dtype, det=K.has_deterministic_component(kernel)
    )
    x0 = Gaussian(
        jnp.zeros(atoms.P_inf.shape[-1], dtype),
        psd.symmetrize(atoms.P_inf).astype(dtype),
    )
    return As, offs, Qs, (Hs, hs), x0


def _add_mean_to_hs(hs, mean_fn, x, dtype, N):
    """Fold the GP mean into the emission offsets
    (reference: src/gp/lti_sde.jl:118-131)."""
    if isinstance(mean_fn, ZeroMean):
        return hs
    if isinstance(mean_fn, ConstMean):
        c = jnp.asarray(mean_fn.c, dtype)
        return _combine_leaves(lambda h: h + c, [hs], N)
    m = mean_vector(mean_fn, time_array(x)).astype(dtype)
    hs_arr = tmaterialize(hs) if is_fill(hs) else hs
    return hs_arr + m


def build_lgssm(fx: FiniteLTISDE) -> LGSSM:
    """Compile a FiniteLTISDE into an LGSSM
    (reference: src/gp/lti_sde.jl:71-81). Grid inputs route to the
    spatio-temporal compiler (reference: src/space_time/to_gauss_markov.jl)."""
    if _is_grid(fx.x):
        from ..space_time import builder

        return builder.build_lgssm_spacetime(fx)
    f = fx.f
    dtype = _storage_dtype(f.storage)
    As, offs, Qs, (Hs, hs), x0 = lgssm_components(f.f.kernel, fx.x, dtype)
    N = num_times(fx.x)
    hs = _add_mean_to_hs(hs, f.f.mean, fx.x, dtype, N)
    emis = ScalarEmissions(H=Hs, h=hs, s=fx.noise)
    from . import kernels as K

    det = K.has_deterministic_component(f.f.kernel)
    return LGSSM(
        GaussMarkov(As=As, offs=offs, Qs=Qs, x0=x0, forward=True,
                    det_blocks=det),
        emis,
    )


# ---------------------------------------------------------------------------
# AbstractGPs-style verbs on FiniteLTISDE
# ---------------------------------------------------------------------------

def _to_time_form(x, y):
    if _is_grid(x):
        from ..space_time import grids

        return grids.observations_to_time_form(x, y)
    return y


def _destructure(x, ys):
    if _is_grid(x):
        from ..space_time import grids

        return grids.destructure(x, ys)
    return ys


def _route_kron(fx, engine) -> bool:
    """engine="kron" forces the factored spatio-temporal engine
    (space_time/kron.py); engine=None auto-selects it on TPU for supported
    grid models at Ns >= 80. Measured on v5e (f32, Separable(EQ, Matern52),
    Nt=500-1000): the factored filter is overhead-flat in Ns while the
    materialised D=Ns*Dt recursion grows as Ns^3 — crossover near Ns ~ 80
    (Ns=100: 48 vs 60 ms; Ns=200: 50 vs 107 ms)."""
    from ..space_time import kron

    if engine == "kron":
        if not kron.supports(fx):
            raise TypeError(
                "engine='kron' requires a (possibly Scaled) Separable model "
                "on a RectilinearGrid"
            )
        return True
    if engine is None and _is_grid(fx.x):
        import jax

        return (
            jax.default_backend() == "tpu"
            and kron.supports(fx)
            and fx.x.xl.shape[0] >= 80
        )
    return False


def rand(key, fx: FiniteLTISDE, n: int = None, *, engine=None):
    """Joint prior sample, flat-form; `n` draws i.i.d. samples stacked on a
    leading axis (reference: src/gp/lti_sde.jl:48-58)."""
    if _route_kron(fx, engine):
        from ..space_time import kron

        if n is None:
            return _destructure(fx.x, kron.rand(key, fx))
        import jax

        keys = jax.random.split(key, n)
        return jax.vmap(lambda k: _destructure(fx.x, kron.rand(k, fx)))(keys)
    model = build_lgssm(fx)
    if n is None:
        return _destructure(fx.x, lgssm_mod.rand(key, model, engine=engine))
    import jax

    keys = jax.random.split(key, n)
    return jax.vmap(
        lambda k: _destructure(fx.x, lgssm_mod.rand(k, model, engine=engine))
    )(keys)


def basis_setup(fx: FiniteLTISDE):
    """Front end of the basis engine (ops/basis.py): split the kernel into
    stochastic + deterministic summands, compile the REDUCED stochastic
    LGSSM, and evaluate the deterministic components' closed-form basis
    columns M (N, d_det) with weight prior P0.

    Returns (model_stoch, M, P0) with M/P0 in the storage dtype; M is None
    when the kernel has no deterministic component. Raises TypeError for
    grid inputs (the spatio-temporal compilers handle those)."""
    if _is_grid(fx.x):
        raise TypeError("engine='basis' supports time-series inputs only")
    f = fx.f
    dtype = _storage_dtype(f.storage)
    kern = f.f.kernel
    stoch, det = K.split_deterministic(kern)
    if not det:
        return build_lgssm(fx), None, None
    if not stoch:
        raise TypeError(
            "engine='basis' needs at least one stochastic summand; a purely "
            "deterministic kernel has a singular prior — add observation "
            "noise to the model instead (engine='sequential')"
        )
    k_stoch = stoch[0] if len(stoch) == 1 else K.Sum(tuple(stoch))
    fx_stoch = FiniteLTISDE(LTISDE(GP(k_stoch, f.f.mean), f.storage), fx.x, fx.noise)
    model = build_lgssm(fx_stoch)

    t = time_array(fx.x)
    tau = jnp.asarray(t, jnp.float64) - jnp.asarray(t, jnp.float64)[0]
    Ms, P0s = [], []
    for kd in det:
        M_j, P0_j = K.det_basis_columns(kd, tau, jnp.float64)
        Ms.append(M_j)
        P0s.append(P0_j)
    M = jnp.concatenate(Ms, axis=-1).astype(dtype)
    P0 = psd.block_diag(P0s).astype(dtype)
    return model, M, P0


def _logpdf_basis(fx: FiniteLTISDE, y, *, sub_engine=None, n_blocks=None,
                  n_warmup=None, block_len=16, nan_fallback=True,
                  head_dtype=None, fwd_mode=False):
    """Marginalised-basis lml (see ops/basis.py). NaNs in y are missing
    observations: the usual large-variance fill of the reduced model makes
    every column's innovation contribution vanish at missing steps, and the
    standard volume compensation applies unchanged.

    sub_engine="steady" runs the constant-gain grams engine
    (ops/basis.grams_steady) on the raw Fill model — it requires
    fully-observed data, with the same concrete-NaN ValueError /
    traced-NaN lax.cond fallback contract as engine="steady" logpdf
    (models/missings.logpdf_with_missings)."""
    import jax

    from ..ops import basis as basis_ops

    model, M, P0 = basis_setup(fx)
    dtype = model.trans.x0.dtype
    y = jnp.asarray(y, dtype)
    if M is None:  # no deterministic part: plain fast path
        return missings_mod.logpdf_with_missings(
            model, y, engine=sub_engine, nan_fallback=nan_fallback
        )
    w_off = jnp.zeros(M.shape[-1] + 1, dtype).at[0].set(1.0)

    def _lml(model_, y_, eng, comp):
        Y = jnp.concatenate([y_[:, None], M], axis=-1)
        return basis_ops.logpdf_basis(
            model_, Y, w_off, P0, engine=eng, n_blocks=n_blocks,
            n_warmup=n_warmup, block_len=block_len,
            head_dtype=head_dtype if eng == "steady" else None,
            fwd_mode=fwd_mode,
        ) + comp

    if sub_engine == "steady":
        # NB test the reduction, not y: y closed over under jit is concrete
        # while jnp ops on it still bind to the ambient trace.
        nan_any = jnp.isnan(y).any()
        if not isinstance(nan_any, jax.core.Tracer):
            if bool(nan_any):
                raise ValueError(
                    "sub_engine='steady' requires fully-observed data (no "
                    "NaNs); use sub_engine='block' for missing data"
                )
            return _lml(model, y, "steady", jnp.zeros((), dtype))
        # cond disabled on TPU: see models/missings.logpdf_with_missings
        # (the compiled conditional mis-selects on v5e, round 5)
        if nan_fallback and jax.default_backend() != "tpu":
            def fast(y_):
                return _lml(model, y_, "steady", jnp.zeros((), dtype))

            def safe(y_):
                m_f, y_f, comp = missings_mod.transform_model_and_obs(model, y_)
                return _lml(m_f, y_f, "block", comp)

            return jax.lax.cond(nan_any, safe, fast, y)
        return _lml(model, y, "steady", jnp.zeros((), dtype))
    model_f, y_f, comp = missings_mod.transform_model_and_obs(model, y)
    return _lml(model_f, y_f, sub_engine or "block", comp)


def logpdf(fx: FiniteLTISDE, y, *, engine=None, **engine_kwargs):
    """Log marginal likelihood; NaNs in y are missing observations
    (reference: src/gp/lti_sde.jl:60-68). engine="kron" selects the
    factored spatio-temporal filter (space_time/kron.py) for plain
    Separable models on a RectilinearGrid; engine="basis" marginalises
    deterministic kernel components (Cosine/Constant/ApproxPeriodic) as
    closed-form basis functions against the reduced stochastic SSM
    (ops/basis.py) — the fast exact path for sum kernels with
    deterministic blocks.

    engine="lti"/"steady" require fully-observed data: with concrete y a
    NaN raises ValueError; under jit (traced y, e.g. a training loop whose
    data later gains gaps) a runtime lax.cond falls back to the block
    engine's missing-data path when NaNs appear, so the lml stays finite
    and exact (pass nan_fallback=False to restore NaN propagation and skip
    compiling the fallback branch)."""
    if engine == "basis" or (
        engine is None
        and not _is_grid(fx.x)
        and K.has_deterministic_component(fx.f.f.kernel)
        and K.split_deterministic(fx.f.f.kernel)[0]
    ):
        # Auto-route kernels with deterministic components (given at least
        # one stochastic summand) to the basis engine: exact same lml as
        # filtering the full state, without the deterministic blocks'
        # unbounded information accumulation (which forces the sequential
        # engine + an f32 process-noise floor on every other path).
        return _logpdf_basis(fx, y, **engine_kwargs)
    if _route_kron(fx, engine):
        from ..space_time import kron

        return kron.logpdf(fx, y)
    y_tf = _to_time_form(fx.x, jnp.asarray(y))
    return missings_mod.logpdf_with_missings(
        build_lgssm(fx), y_tf, engine=engine, **engine_kwargs
    )


def marginals(fx: FiniteLTISDE, *, engine=None):
    """Per-observation marginal (means, vars) including observation noise,
    flat-form (reference: src/gp/lti_sde.jl:33-35)."""
    if _route_kron(fx, engine):
        from ..space_time import kron

        m, v = kron.marginals(fx)
        return _destructure(fx.x, m), _destructure(fx.x, v)
    m, v = lgssm_mod.marginals_diag(build_lgssm(fx), engine=engine)
    return _destructure(fx.x, m), _destructure(fx.x, v)


def mean_and_var(fx: FiniteLTISDE, *, engine=None):
    return marginals(fx, engine=engine)


def mean(fx: FiniteLTISDE, *, engine=None):
    return marginals(fx, engine=engine)[0]


def var(fx: FiniteLTISDE, *, engine=None):
    return marginals(fx, engine=engine)[1]


def cov(fx: FiniteLTISDE):
    """Dense prior covariance — O(N^2); naive-path only
    (reference: src/gp/lti_sde.jl:46)."""
    t = time_array(fx.x)
    Kmat = K.gram(fx.f.f.kernel, t)
    s = tmaterialize(fx.noise) if is_fill(fx.noise) else fx.noise
    return Kmat + jnp.diag(s)
