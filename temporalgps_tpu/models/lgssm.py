"""LGSSM — model container and inference drivers.

Mirror of the reference's `LGSSM` layer (reference: src/models/lgssm.jl),
re-designed for XLA: every driver is a pure function over pytrees, executed by
one of the interchangeable engines:

  * "sequential" — `lax.scan` over time; the trustworthy reference engine,
    mirroring the reference's `scan_emit` loop step-for-step.
  * "parallel"   — Sarkka-style parallel prefix scans on
    `lax.associative_scan` (ops/assoc.py); O(log N) depth.
  * "block"      — two-phase block-parallel engine (ops/block.py); the TPU
    fast exact path: vmapped within-block scans + cross-block prefix
    combine, ~O(1) HBM passes, Pallas phase kernels at small D.
  * "sqrt"       — square-root (Cholesky-factor) block engine
    (ops/sqrt.py); conditioning-proof at large D.
  * "lti"        — time-invariant constant-operator pipeline (ops/lti.py;
    component-major layout at moderate D, ops/lti_cm.py); exact, f32
    reverse-mode discouraged (see the engine warning).
  * "steady"     — steady-state constant-gain engine (ops/steady.py);
    the fastest fwd+grad path under its warmup approximation contract.

Grid models add "kron" (space_time/kron.py, factored Kronecker filter);
kernels with deterministic components route through the basis engine
(ops/basis.py) at the gp API layer. Engine choice is a numerics contract,
not just a speed knob — see docs/ROADMAP.md for the measured matrix.

The RTS smoother is represented, exactly as in the reference, as *another
LGSSM* with reversed ordering and inverted dynamics whose x0 is the final
filtering distribution (reference: src/models/lgssm.jl:193-240), so
rand/marginals/logpdf of the posterior reuse the same engines.

Step order per ordering matches the reference exactly:
  Forward: transition-predict, then emit/update   (lgssm.jl:155-159)
  Reverse: emit/update first, then transition      (lgssm.jl:161-165)
"""

import functools
import warnings
from typing import Any

import jax
import jax.numpy as jnp

from ..config import POSTERIOR_JITTER, precision_ctx
from ..ops import lgc
from ..utils import psd
from ..utils.fill import scan_emit, time_length, tindex
from ..utils.gaussian import Gaussian, gaussian_rand
from ..utils.pytrees import pytree_dataclass
from . import emissions as em
from .gauss_markov import GaussMarkov


@pytree_dataclass
class LGSSM:
    trans: GaussMarkov
    emis: Any  # one of the emission containers

    def __len__(self):
        return len(self.trans)

    @property
    def latent_dim(self) -> int:
        return self.trans.dim


def _trans_params(model: LGSSM):
    t = model.trans
    return (t.As, t.offs, t.Qs)


def _step_params(model: LGSSM):
    return (_trans_params(model), model.emis)


# None = auto: "block" on the TPU backend when the model supports it (the
# sequential scan's per-iteration dispatch overhead makes it ~3 orders of
# magnitude slower there), "sequential" elsewhere (exact, and fastest to
# trace/compile on CPU). Set to an engine name to force it globally.
DEFAULT_ENGINE = None


def _resolve_engine(engine, model=None):
    if engine is not None:
        return engine
    if DEFAULT_ENGINE is not None:
        return DEFAULT_ENGINE
    if model is not None and jax.default_backend() == "tpu":
        from ..ops import block

        # Block wins where per-iteration dispatch overhead dominates (small
        # per-step compute). Measured on v5e: D=3 scalar 210 Msteps/s vs
        # 0.05 sequential; but D=150 spatio-temporal 141 ms vs 25 ms
        # sequential (the element algebra's ~3x flops in D^3 ops loses once
        # compute dominates). Crossover is around D ~ 32. Models with
        # deterministic-diffusion blocks (Cosine/Constant/ApproxPeriodic)
        # stay sequential: their unbounded information growth NaNs the
        # covariance-form element combine in f32 (measured at D=19, N=1e6).
        if (
            block._supports(model)
            and model.latent_dim <= 32
            and not model.trans.det_blocks
        ):
            return "block"
    return "sequential"


def _resolve_engine_affine(engine, model=None):
    """_resolve_engine for the DATA-FREE affine drivers (marginals /
    marginals_diag / latent_marginals / rand): these run on the affine
    prefix pipeline, which supports BOTH orderings (assoc._iteration_view
    re-aligns Reverse models into transition-then-emit form), so the
    reverse-ordered posterior LGSSM must not fall back to the sequential
    scan the way the filtering drivers do. Measured on v5e: posterior
    marginals at N=10k were 21.3 ms through the sequential fallback vs
    ~1 ms on the blocked affine pipeline (the public-API half of
    probes/posterior_probe.py's N=1M 31.6 ms number)."""
    if engine is not None:
        return engine
    if DEFAULT_ENGINE is not None:
        return DEFAULT_ENGINE
    if (
        model is not None
        and jax.default_backend() == "tpu"
        and model.latent_dim <= 32
        and not model.trans.det_blocks
    ):
        return "block"
    return "sequential"


def _auto_lti(model) -> bool:
    """Auto-select the lti engine for DATA-FREE drivers (marginals): the
    time-invariant vector-emission models at moderate state dims (the DTC
    grid family) run fastest on the constant-element-power engine (v5e,
    D=30 Nt=100k elbo: 573 ms vs 1925 sequential — mostly from this
    marginals path). It NaNs past the f32 conditioning cliff at D ~ 150
    and loses to the Pallas block path at tiny D — gate to 4 < D <= 48.
    logpdf keeps lti opt-in only: its reverse-mode HLO is
    compile-prohibitive, which would trap jax.grad users."""
    from ..ops import lti

    return (
        jax.default_backend() == "tpu"
        and lti.supported(model)
        and not isinstance(model.emis, em.ScalarEmissions)
        and 4 < model.latent_dim <= 48
    )




def _with_precision(model_arg=0):
    """Trace the wrapped driver under the state-dim-appropriate matmul
    precision (config.precision_ctx): big-state f32 covariance recursions
    need true-f32 matmuls on TPU; small states keep the faster default.

    Exception: the *sequential* engine on TPU always traces under 'highest'
    regardless of D. Its per-step (D, D) dot_generals run as single-pass
    bf16 by default, which passes values (~1e-4 rel at N=20k, D=3) but
    corrupts reverse-mode gradients (measured: d logpdf/d log sigma2 off by
    7.6% vs the f64 ground truth). The sequential scan is dispatch-bound on
    TPU, so true-f32 matmuls cost nothing there. The lane-major block/Pallas
    paths are immune (pure element-wise VPU code, no dot_generals)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            model = args[model_arg]
            resolved = _resolve_engine(kwargs.get("engine"), model)
            # steady/lti join the exception (round 5): their warmup/chain
            # recursions have the same bf16-reverse corruption, and their
            # runtime is dominated by the O(k)/O(1) constant machinery,
            # not the D<=4 dots — 'highest' is effectively free there too.
            if resolved in ("sequential", "steady", "lti") and (
                jax.default_backend() == "tpu"
            ):
                ctx = jax.default_matmul_precision("highest")
            else:
                ctx = precision_ctx(model.latent_dim)
            with ctx:
                return fn(*args, **kwargs)

        return wrapper

    return deco


# ---------------------------------------------------------------------------
# logpdf / filter
# ---------------------------------------------------------------------------

@_with_precision()
def logpdf(model: LGSSM, y, *, engine=None, pallas=None, n_blocks=None,
           phase2=None, n_warmup=None):
    """Log marginal likelihood via the Kalman filter
    (reference: src/models/lgssm.jl:147-165). `pallas=False` forces the
    pure-XLA block schedule (required under forward-mode jvp, which cannot
    cross the Pallas custom_vjp). `phase2="sqrt"` runs the block engine's
    cross-block combine in square-root form (ops/sqrt.py). `n_warmup`
    overrides the steady engine's exact-filter warmup length (see
    ops/steady.suggest_warmup for choosing it at small lambda*dt)."""
    engine = _resolve_engine(engine, model)
    if engine == "lti":
        from ..ops import lti

        if not lti.supported(model):
            raise ValueError(
                "engine='lti' requires a forward model with all-Fill "
                "(time-invariant) transition and emission parameters"
            )
        if model.trans.x0.mean.dtype == jnp.float32:
            # Measured: f32 reverse-mode grads through the constant-power
            # chain drift ~linearly in depth (22% rel at N=4096).  Cannot
            # be detected at trace time (fwd- and reverse-mode both see JVP
            # tracers) and a custom_vjp guard would break the ACCURATE
            # fwd-mode path, so warn once at call time instead.
            warnings.warn(
                "logpdf(engine='lti') at float32: reverse-mode (jax.grad) "
                "hyperparameter gradients through the lti power chain are "
                "numerically untrustworthy (measured 22% rel error at "
                "N=4096). Use engine='steady'/'block', forward-mode "
                "(learning.value_and_grad_fwd), or float64.",
                UserWarning,
                stacklevel=2,
            )
        return lti.logpdf(model, y, n_blocks=n_blocks)
    if engine == "steady":
        from ..ops import steady

        return steady.logpdf(model, y, n_blocks=n_blocks, n_warmup=n_warmup)
    if engine == "parallel":
        from ..ops import assoc

        return assoc.logpdf(model, y)
    if engine == "sqrt":
        from ..ops import sqrt

        return sqrt.logpdf(model, y)
    if engine == "block":
        from ..ops import block

        return block.logpdf(model, y, pallas=pallas, n_blocks=n_blocks,
                            phase2=phase2)

    def step(x, params):
        ((A, a, Q), e), yt = params
        if model.trans.forward:
            xp = lgc.predict(x, A, a, Q)
            xf, lml = em.step_posterior_and_lml(xp, e, yt)
            return lml, xf
        xf, lml = em.step_posterior_and_lml(x, e, yt)
        xp = lgc.predict(xf, A, a, Q)
        return lml, xp

    if model.latent_dim > 8:
        # big-state reverse-mode residuals (per-step innovation factors
        # etc.) otherwise exceed HBM at N ~ 1e5; store only the carry.
        step = jax.checkpoint(step)
    lmls, _ = scan_emit(
        step, (_step_params(model), y), model.trans.x0,
        reverse=not model.trans.forward,
    )
    return jnp.sum(lmls)


@_with_precision()
def filter_(model: LGSSM, y, *, engine=None):
    """Filtering distributions at every step
    (reference: src/models/lgssm.jl:171-187). Returns a stacked Gaussian."""
    engine = _resolve_engine(engine, model)
    if engine == "parallel":
        from ..ops import assoc

        return assoc.filter_(model, y)
    if engine == "sqrt":
        from ..ops import sqrt

        return sqrt.filter_(model, y)
    if engine == "block":
        from ..ops import block

        return block.filter_(model, y)

    def step(x, params):
        ((A, a, Q), e), yt = params
        if model.trans.forward:
            xp = lgc.predict(x, A, a, Q)
            xf, _ = em.step_posterior_and_lml(xp, e, yt)
            return xf, xf
        xf, _ = em.step_posterior_and_lml(x, e, yt)
        xp = lgc.predict(xf, A, a, Q)
        return xf, xp

    xs, _ = scan_emit(
        step, (_step_params(model), y), model.trans.x0,
        reverse=not model.trans.forward,
    )
    return xs


# ---------------------------------------------------------------------------
# marginals
# ---------------------------------------------------------------------------

@_with_precision()
def marginals(model: LGSSM, *, engine=None) -> Gaussian:
    """Observation-space marginal at every step (dense covariance)
    (reference: src/models/lgssm.jl:99-115)."""
    engine = _resolve_engine_affine(engine, model)
    if engine in ("parallel", "block"):
        xs = _latent_marginals_engine(model, engine)
        return em.step_predict(xs, _emis_batched(model))

    def step(x, params):
        (A, a, Q), e = params
        if model.trans.forward:
            xp = lgc.predict(x, A, a, Q)
            return em.step_predict(xp, e), xp
        yt = em.step_predict(x, e)
        xp = lgc.predict(x, A, a, Q)
        return yt, xp

    ys, _ = scan_emit(
        step, _step_params(model), model.trans.x0, reverse=not model.trans.forward
    )
    return ys


@_with_precision()
def marginals_diag(model: LGSSM, *, engine=None):
    """Observation-space marginal means and variance diagonals
    (reference: src/models/lgssm.jl:125-141). Returns (means, vars)."""
    if engine is None and _auto_lti(model):
        engine = "lti"
    engine = _resolve_engine_affine(engine, model)
    if engine == "lti":
        from ..ops import lti

        if not lti.supported(model):
            raise ValueError("engine='lti' requires an all-Fill forward model")
        return lti.marginals_diag(model)
    if engine == "steady":
        from ..ops import steady

        return steady.marginals_diag(model)
    if engine == "block" and isinstance(model.emis, em.ScalarEmissions):
        from ..ops import block

        if (
            jax.default_backend() == "tpu"
            and block._marginals_pallas_supported(model)
        ):
            # Fully component-major: latent prefix AND emission projection
            # never materialise (N, D, D) arrays.
            return block.marginals_diag_pallas(model)
    if engine in ("parallel", "block"):
        xs = _latent_marginals_engine(model, engine)
        return em.step_predict_marginals(xs, _emis_batched(model))

    def step(x, params):
        (A, a, Q), e = params
        if model.trans.forward:
            xp = lgc.predict(x, A, a, Q)
            return em.step_predict_marginals(xp, e), xp
        out = em.step_predict_marginals(x, e)
        xp = lgc.predict(x, A, a, Q)
        return out, xp

    out, _ = scan_emit(
        step, _step_params(model), model.trans.x0, reverse=not model.trans.forward
    )
    return out


@_with_precision()
def latent_marginals(model: LGSSM, *, engine=None) -> Gaussian:
    """Marginals of the latent chain itself (stacked Gaussian)."""
    if engine is None and _auto_lti(model):
        engine = "lti"
    engine = _resolve_engine_affine(engine, model)
    if engine == "lti":
        from ..ops import lti

        if not lti.supported(model):
            raise ValueError("engine='lti' requires an all-Fill forward model")
        return lti.latent_marginals(model)
    if engine == "steady":
        from ..ops import steady

        return steady.latent_marginals(model)
    if engine in ("parallel", "block"):
        return _latent_marginals_engine(model, engine)

    def step(x, params):
        (A, a, Q), _e = params
        if model.trans.forward:
            xp = lgc.predict(x, A, a, Q)
            return xp, xp
        xp = lgc.predict(x, A, a, Q)
        return x, xp

    xs, _ = scan_emit(
        step, _step_params(model), model.trans.x0, reverse=not model.trans.forward
    )
    return xs


def _latent_marginals_engine(model, engine):
    """Latent marginals on the requested parallel schedule: the blocked
    affine engine (ops/block) for engine="block" — component-major Pallas
    pipeline on TPU for D <= 3, XLA blocked otherwise — or the N-element
    associative scan for engine="parallel"."""
    if engine == "block":
        from ..ops import block

        if (
            jax.default_backend() == "tpu"
            and block._marginals_pallas_supported(model)
        ):
            return block.latent_marginals_pallas(model)
        return block.latent_marginals(model)
    from ..ops import assoc

    return assoc.latent_marginals(model)


def _emis_batched(model: LGSSM):
    """Emission container materialised with a leading time axis, for batched
    (non-scan) application."""
    from ..utils.fill import tmaterialize

    return tmaterialize(model.emis)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

@_with_precision(model_arg=1)
def rand(key, model: LGSSM, *, engine=None):
    """Joint sample of the observations (reference: src/models/lgssm.jl:65-91).

    All randomness is pre-drawn so the scan body is deterministic — the same
    design the reference adopted for checkpointed reverse AD
    (reference: lgssm.jl:71-77), which is equally the right design for
    `jax.checkpoint` and for the parallel engines.
    """
    N = len(model)
    D = model.latent_dim
    k0, kt, ke = jax.random.split(key, 3)
    x_init = gaussian_rand(k0, model.trans.x0)
    eps_t = jax.random.normal(kt, (N, D), x_init.dtype)
    e0 = tindex(model.emis, 0)
    if isinstance(model.emis, em.ScalarEmissions):
        eps_e = jax.random.normal(ke, (N,), x_init.dtype)
    else:
        Dout = em.dim_out(model.emis)
        eps_e = jax.random.normal(ke, (N, Dout), x_init.dtype)

    engine = _resolve_engine_affine(engine, model)
    if engine == "block":
        from ..ops import block

        return block.rand_with_eps(model, eps_t, eps_e, x_init)
    if engine == "parallel":
        from ..ops import assoc

        return assoc.rand_with_eps(model, eps_t, eps_e, x_init)
    if engine in ("lti", "steady"):
        from ..ops import lti, steady

        if not lti.supported(model):
            raise ValueError(
                f"engine={engine!r} rand requires a forward model with "
                "all-Fill (time-invariant) parameters"
            )
        return steady.rand_with_eps(model, eps_t, eps_e, x_init)

    def step(x, params):
        ((A, a, Q), e), (et, ee) = params
        if model.trans.forward:
            x_next = lgc.conditional_rand(et, x, A, a, Q)
            yt = em.step_conditional_rand(ee, x_next, e)
            return yt, x_next
        yt = em.step_conditional_rand(ee, x, e)
        x_next = lgc.conditional_rand(et, x, A, a, Q)
        return yt, x_next

    ys, _ = scan_emit(
        step, (_step_params(model), (eps_t, eps_e)), x_init,
        reverse=not model.trans.forward,
    )
    return ys


# ---------------------------------------------------------------------------
# posterior (RTS smoother as a Reverse-ordered LGSSM)
# ---------------------------------------------------------------------------

def _invert_dynamics(first: Gaussian, second: Gaussian, A):
    """Reversed conditioned dynamics (reference: src/models/lgssm.jl:231-240).

    Returns (A_rev, a_rev, Q_rev) with
        Gt = second.P^{-1} A first.P
        A_rev = Gt^T, a_rev = first.m - Gt^T second.m,
        Q_rev = first.P - Gt^T second.P Gt.
    """
    Pf = psd.symmetrize(first.cov)
    Pp = psd.symmetrize(second.cov) + POSTERIOR_JITTER * jnp.eye(
        A.shape[-1], dtype=A.dtype
    )
    L = psd.cholesky(Pp)
    Gt = psd.chol_solve(L, A @ Pf)  # (..., D, D)
    GtT = jnp.swapaxes(Gt, -1, -2)
    A_rev = GtT
    a_rev = first.mean - jnp.einsum("...ij,...j->...i", GtT, second.mean)
    Q_rev = Pf - GtT @ Pp @ Gt
    return A_rev, a_rev, Q_rev


@_with_precision()
def posterior(model: LGSSM, y, *, engine=None) -> LGSSM:
    """Filter forward, emitting the inverted dynamics; return the smoother as
    an LGSSM with reversed ordering whose x0 is the final filtering
    distribution (reference: src/models/lgssm.jl:193-228)."""
    engine = _resolve_engine(engine, model)
    if engine == "lti":
        from ..ops import lti

        if not lti.supported(model):
            raise ValueError("engine='lti' requires an all-Fill forward model")
        return lti.posterior(model, y)
    if engine == "sqrt":
        from ..ops import sqrt

        return sqrt.posterior(model, y)
    if engine == "block":
        from ..ops import block

        return block.posterior(model, y)
    if engine == "parallel":
        from ..ops import assoc

        return assoc.posterior(model, y)

    def step(x, params):
        ((A, a, Q), e), yt = params
        if model.trans.forward:
            xp = lgc.predict(x, A, a, Q)
            new_dyn = _invert_dynamics(x, xp, A)
            xf, _ = em.step_posterior_and_lml(xp, e, yt)
            return new_dyn, xf
        xf, _ = em.step_posterior_and_lml(x, e, yt)
        xp = lgc.predict(xf, A, a, Q)
        return _invert_dynamics(xp, xf, A), xp

    new_dyn, x_last = scan_emit(
        step, (_step_params(model), y), model.trans.x0,
        reverse=not model.trans.forward,
    )
    As_rev, as_rev, Qs_rev = new_dyn
    new_trans = GaussMarkov(
        As=As_rev, offs=as_rev, Qs=Qs_rev, x0=x_last,
        forward=not model.trans.forward,
        det_blocks=model.trans.det_blocks,
    )
    return LGSSM(new_trans, model.emis)
