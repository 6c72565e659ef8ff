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


def gram_points(k: Separable, x, y=None):
    """Pairwise k((r,t),(r',t')) over OFF-GRID tuple inputs.

    x (and optionally y) is a pair `(space_points, times)` of equal-length
    arrays — the vector-of-tuples form of the reference
    (src/space_time/separable_kernel.jl:26-41, binary kernelmatrix).
    Returns the (len(x), len(y)) cross gram; the grid fast paths
    (gram_grid) remain the engine — this is the oracle/utility surface."""
    xl, xr = x
    yl, yr = (xl, xr) if y is None else y
    return K.gram(k.l, xl, yl) * K.gram(k.r, xr, yr)


def _elementwise_k(k, x, y):
    """k(x_i, y_i) elementwise via single-point grams (oracle-grade)."""
    import jax

    return jax.vmap(
        lambda a, b: K.gram(k, a[None], b[None])[0, 0]
    )(jnp.asarray(x), jnp.asarray(y))


def gram_diag_points(k: Separable, x, y=None):
    """Elementwise k((r_i,t_i),(r'_i,t'_i)) over off-grid tuple inputs
    (reference: separable_kernel.jl:15-19 unary, :27-34 binary
    kernelmatrix_diag)."""
    xl, xr = x
    if y is None:
        return K.gram_diag(k.l, xl) * K.gram_diag(k.r, xr)
    yl, yr = y
    return _elementwise_k(k.l, xl, yl) * _elementwise_k(k.r, xr, yr)


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
