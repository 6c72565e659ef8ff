"""Separable spatio-temporal kernel k((r,t),(r',t')) = k_l(r,r') * k_r(t,t')
(reference: src/space_time/separable_kernel.jl)."""

from typing import Any

import jax.numpy as jnp

from ..gp import kernels as K
from ..utils.pytrees import pytree_dataclass
from ..utils.regular_spacing import time_array
from . import grids


@pytree_dataclass
class Separable(K.Kernel):
    l: Any  # spatial kernel
    r: Any  # temporal kernel


def gram_grid(k: Separable, x: grids.RectilinearGrid):
    """Dense gram over a grid's flat (space-fastest) indexing — the oracle."""
    Kr = K.gram(k.l, x.xl)
    Kt = K.gram(k.r, time_array(x.xr))
    return jnp.kron(Kt, Kr)  # time-major blocks of space matrices


def gram_diag_grid(k: Separable, x) -> jnp.ndarray:
    """(Nt, Ns) per-time diagonal of the kernel."""
    if isinstance(x, grids.RectilinearGrid):
        dr = K.gram_diag(k.l, x.xl)
        dt = K.gram_diag(k.r, time_array(x.xr))
        return dt[:, None] * dr[None, :]
    if isinstance(x, grids.RegularInTime):
        dt = K.gram_diag(k.r, time_array(x.ts))
        import jax

        dr = jax.vmap(lambda v: K.gram_diag(k.l, v))(x.vs_padded)
        return dt[:, None] * dr
    raise TypeError(type(x))
