"""Mean functions (the needed subset of AbstractGPs semantics:
ZeroMean / ConstMean / CustomMean, reference: test/gp/lti_sde.jl:158-162)."""

from typing import Any, Callable

import jax.numpy as jnp

from ..utils.pytrees import pytree_dataclass


@pytree_dataclass
class ZeroMean:
    pass


@pytree_dataclass
class ConstMean:
    c: Any


@pytree_dataclass(static_fields=("fn",))
class CustomMean:
    fn: Callable  # t -> mean, vectorised over t


def mean_vector(m, t):
    """Evaluate a mean function on an array of times."""
    t = jnp.asarray(t)
    if isinstance(m, ZeroMean):
        return jnp.zeros_like(t)
    if isinstance(m, ConstMean):
        return jnp.broadcast_to(jnp.asarray(m.c, t.dtype), t.shape)
    if isinstance(m, CustomMean):
        return jnp.asarray(m.fn(t))
    raise TypeError(type(m))
