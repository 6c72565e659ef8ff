"""Hyperparameter learning utilities.

The reference defers learning to Optim/ParameterHandling/Mooncake
(reference: examples/exact_time_learning.jl); the JAX-native equivalents are
optax + jax.value_and_grad. This module provides the small amount of glue:
positive-constrained parameter handling and a jitted fit loop (adam or
L-BFGS with backtracking linesearch, mirroring the reference's BFGS setup).
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def positive(x):
    """Initial value of a positive-constrained parameter (stored as log)."""
    return jnp.log(jnp.asarray(x, jnp.float64))


def constrained(log_x):
    return jnp.exp(log_x)


class FitResult(NamedTuple):
    params: dict
    losses: jnp.ndarray


def fit(
    objective: Callable,
    params,
    *,
    optimizer=None,
    steps: int = 100,
    _extra_args: bool = False,
) -> FitResult:
    """Minimise `objective(params)` with optax; returns optimised params and
    the per-step loss trajectory. The whole loop runs as one jitted scan."""
    if optimizer is None:
        optimizer = optax.adam(1e-1)

    opt_state = optimizer.init(params)
    vg = jax.value_and_grad(objective)

    def step(carry, _):
        p, s = carry
        val, g = vg(p)
        if _extra_args:
            updates, s = optimizer.update(
                g, s, p, value=val, grad=g, value_fn=objective
            )
        else:
            updates, s = optimizer.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), val

    (params, _), losses = jax.lax.scan(step, (params, opt_state), None, length=steps)
    return FitResult(params, losses)


def value_and_grad_fwd(f):
    """Forward-mode value_and_grad for objectives with FEW parameters.

    Reverse mode through the Kalman scans stores/replays per-step residuals
    (the backward pass costs ~15x the forward on TPU); with k scalar
    hyperparameters, one vmapped JVP pass costs ~(1+k) forward FLOPs with
    *no* residuals and no backward scans. Exact same gradient.

    f: params_pytree -> scalar. Returns fn: params -> (value, grad_pytree).
    """
    from jax.flatten_util import ravel_pytree

    def vg(params, *args):
        flat, unravel = ravel_pytree(params)
        n = flat.shape[0]

        def g(pf):
            return f(unravel(pf), *args)

        basis = jnp.eye(n, dtype=flat.dtype)
        vals, tangents = jax.vmap(lambda v: jax.jvp(g, (flat,), (v,)))(basis)
        return vals[0], unravel(tangents)

    return vg


def value_and_grad_fwd_lgssm(model_fn, y, *, n_blocks=None, fallback=None):
    """Forward-mode value_and_grad of `p -> logpdf(model_fn(p), y)` fused
    into one Pallas pass (ops/block.logpdf_fwd_grad): the primal filter and
    all k tangent recursions share the three phase kernels, so the cost is
    ~(1+k) primal-filter FLOPs with zero scan residuals and ONE kernel
    pipeline dispatch — vs the vmapped-JVP path (`value_and_grad_fwd`),
    which re-pays the XLA block schedule's dispatch overhead per tangent.

    model_fn: flat params array -> LGSSM (Fill-parameter, scalar emissions,
    D <= 3 — the Matern learning configuration). Falls back to
    `value_and_grad_fwd` semantics when the model doesn't qualify.
    Returns fn: params -> (value, grad_array).
    """
    from .ops import block

    def vg(params):
        flat = jnp.asarray(params)
        n = flat.shape[0]
        model = model_fn(flat)
        basis = jnp.eye(n, dtype=flat.dtype)
        tangents = [
            jax.jvp(model_fn, (flat,), (basis[i],))[1] for i in range(n)
        ]
        if block._fwd_grad_supported(model, tangents):
            lp, gs = block.logpdf_fwd_grad(model, y, tangents, n_blocks=n_blocks)
            return lp, jnp.stack(gs)
        from .models.missings import logpdf_with_missings

        fb = fallback or (
            lambda p: logpdf_with_missings(
                model_fn(p), y, engine="block", pallas=False, n_blocks=n_blocks
            )
        )
        val, grad = value_and_grad_fwd(fb)(flat)
        return val, grad

    return vg


def value_and_grad_fisher(model_fn, y, *, n_blocks=None, engine="parallel"):
    """value_and_grad of `p -> logpdf(model_fn(p), y)` via the closed-form
    Fisher/EM identity in innovations form (ops/fisher.py).

    Cost is ~3-4 forward-speed passes INDEPENDENT of the hyperparameter
    count k — the many-hyperparameter learning path. The fused forward-mode
    alternative (`value_and_grad_fwd_lgssm`) scales as (1+k) forward FLOPs
    and its compile grows with k (the k=10 N=1M graph has OOM-killed the
    TPU compile helper); reverse mode stores per-step scan residuals. The
    Fisher path needs only smoothed marginals + filter predictions, all
    from batched parallel passes.

    Accuracy (innovations form, flat in lambda*dt down to 1e-3 — see
    ops/fisher.py): f64 ~1e-9, f32 ~1e-5 rel vs autodiff.

    Scope: model_fn must produce a scalar-emission FORWARD model. Both SPD
    and semi-definite per-step process noise are supported — the
    innovations form is Koopman's exact score, valid for deterministic
    blocks (Cosine/Constant/ApproxPeriodic) too; see ops/fisher.py for the
    measured accuracy. For such kernels the basis engine
    (logpdf(engine="basis") + value_and_grad_fwd) is usually faster still.

    model_fn: flat params array -> LGSSM. Returns fn: params -> (value,
    grad_array).
    """
    from .ops.fisher import logpdf_fisher

    def vg(params):
        flat = jnp.asarray(params)
        return jax.value_and_grad(
            lambda p: logpdf_fisher(model_fn(p), y, n_blocks, engine)
        )(flat)

    return vg


def fit_lbfgs(objective, params, *, steps: int = 50):
    """L-BFGS with linesearch — the optax analogue of the reference's Optim
    BFGS + backtracking (exact_time_learning.jl:53-63)."""
    return fit(objective, params, optimizer=optax.lbfgs(), steps=steps, _extra_args=True)
