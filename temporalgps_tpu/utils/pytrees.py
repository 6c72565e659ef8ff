"""Pytree dataclass helpers.

The reference library uses Julia structs with dispatch; the JAX-native
equivalent is frozen dataclasses registered as pytrees, with non-array
configuration marked static so it participates in jit-compilation keys
rather than tracing.
"""

import dataclasses
from typing import Any

import jax


def pytree_dataclass(cls=None, *, static_fields: tuple = ()):
    """Register a frozen dataclass as a JAX pytree.

    Fields named in ``static_fields`` are treated as compile-time metadata
    (hashed into the jit cache key); all other fields are traced children.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in static_fields]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(static_fields)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def tree_replace(obj: Any, **changes: Any) -> Any:
    """dataclasses.replace that reads nicely at call sites."""
    return dataclasses.replace(obj, **changes)
