"""Emission containers — struct-of-arrays per-step observation models.

The reference stores emissions as a `StructArray` of one of four AbstractLGC
types (reference: src/gp/lti_sde.jl:88-109, src/space_time/pseudo_point.jl:
195-203). Here each variant is a pytree dataclass whose fields carry a leading
time axis (or are `Fill`s), and a uniform functional interface dispatches on
the container type:

  * ScalarEmissions     — ScalarOutputLGC: scalar y per step
                          (reference: linear_gaussian_conditionals.jl:225-257)
  * DenseEmissions      — SmallOutputLGC: vector y, dense innovation Cholesky
                          (reference: linear_gaussian_conditionals.jl:113-151)
  * LargeEmissions      — LargeOutputLGC: Dout >> Din, diagonal noise
                          (reference: linear_gaussian_conditionals.jl:163-214)
  * BottleneckEmissions — BottleneckLGC: project to pseudo-point space, fan out
                          (reference: linear_gaussian_conditionals.jl:278-335)

Each `step_*` function below operates on a *single-step slice* of the
container (as produced by `utils.fill.tindex` / `scan_emit`) but broadcasts
over leading batch axes, so the same code serves sequential, blocked, and
fully parallel engines.
"""

from typing import Any

import jax.numpy as jnp

from ..ops import lgc
from ..utils.fill import time_length
from ..utils.gaussian import Gaussian
from ..utils.pytrees import pytree_dataclass


@pytree_dataclass
class ScalarEmissions:
    H: Any  # (N, D) or Fill((D,))
    h: Any  # (N,)   or Fill(())
    s: Any  # (N,)   observation noise variance


@pytree_dataclass
class DenseEmissions:
    H: Any  # (N, Dout, D) or Fill
    h: Any  # (N, Dout) or Fill
    S: Any  # (N, Dout, Dout) dense observation noise


@pytree_dataclass
class LargeEmissions:
    C: Any       # (N, Dout, D) or Fill
    c: Any       # (N, Dout) or Fill
    s_diag: Any  # (N, Dout) diagonal observation noise


@pytree_dataclass
class BottleneckEmissions:
    H: Any       # (N, M, D) or Fill — projection to pseudo-point space
    h: Any       # (N, M) or Fill
    C: Any       # (N, Dout, M) fan-out
    c: Any       # (N, Dout)
    s_diag: Any  # (N, Dout) diagonal observation noise


Emissions = Any  # union of the four containers


def num_steps(e: Emissions) -> int:
    return time_length(e)


def noise_cov(e: Emissions):
    """The per-step observation noise leaf — the thing replaced by the
    missing-data machinery (reference: src/models/missings.jl:35-41)."""
    if isinstance(e, (ScalarEmissions,)):
        return e.s
    if isinstance(e, DenseEmissions):
        return e.S
    return e.s_diag


def replace_noise_cov(e: Emissions, new):
    import dataclasses

    if isinstance(e, ScalarEmissions):
        return dataclasses.replace(e, s=new)
    if isinstance(e, DenseEmissions):
        return dataclasses.replace(e, S=new)
    return dataclasses.replace(e, s_diag=new)


# --- single-step operations, dispatching on container type -----------------

def step_posterior_and_lml(x: Gaussian, e, y):
    if isinstance(e, ScalarEmissions):
        return lgc.posterior_and_lml_scalar(x, e.H, e.h, e.s, y)
    if isinstance(e, DenseEmissions):
        return lgc.posterior_and_lml_small(x, e.H, e.h, e.S, y)
    if isinstance(e, LargeEmissions):
        return lgc.posterior_and_lml_large(x, e.C, e.c, e.s_diag, y)
    if isinstance(e, BottleneckEmissions):
        return lgc.posterior_and_lml_bottleneck(x, e.H, e.h, e.C, e.c, e.s_diag, y)
    raise TypeError(type(e))


def step_predict(x: Gaussian, e) -> Gaussian:
    """Full observation-space predictive (mean and dense cov). For scalar
    emissions mean/cov are scalar-shaped, matching the reference's
    ScalarOutputLGC emitting Reals rather than length-1 vectors."""
    if isinstance(e, ScalarEmissions):
        m, v = lgc.predict_marginals_scalar(x, e.H, e.h, e.s)
        return Gaussian(m, v)
    if isinstance(e, DenseEmissions):
        return lgc.predict(x, e.H, e.h, e.S)
    if isinstance(e, LargeEmissions):
        S = e.s_diag[..., None] * jnp.eye(e.s_diag.shape[-1], dtype=e.s_diag.dtype)
        return lgc.predict(x, e.C, e.c, S)
    if isinstance(e, BottleneckEmissions):
        return lgc.predict_bottleneck(x, e.H, e.h, e.C, e.c, e.s_diag)
    raise TypeError(type(e))


def step_predict_marginals(x: Gaussian, e):
    """Observation-space predictive mean and *variance diagonal*
    (reference: linear_gaussian_conditionals.jl:63-68, lgssm.jl:125-141)."""
    if isinstance(e, ScalarEmissions):
        return lgc.predict_marginals_scalar(x, e.H, e.h, e.s)
    if isinstance(e, DenseEmissions):
        return lgc.predict_marginals(x, e.H, e.h, jnp.diagonal(e.S, axis1=-2, axis2=-1))
    if isinstance(e, LargeEmissions):
        return lgc.predict_marginals(x, e.C, e.c, e.s_diag)
    if isinstance(e, BottleneckEmissions):
        return lgc.predict_marginals_bottleneck(x, e.H, e.h, e.C, e.c, e.s_diag)
    raise TypeError(type(e))


def step_conditional_rand(eps, x_point, e):
    if isinstance(e, ScalarEmissions):
        return lgc.conditional_rand_scalar(eps, x_point, e.H, e.h, e.s)
    if isinstance(e, DenseEmissions):
        return lgc.conditional_rand(eps, x_point, e.H, e.h, e.S)
    if isinstance(e, LargeEmissions):
        mean = jnp.einsum("...ij,...j->...i", e.C, x_point) + e.c
        return mean + jnp.sqrt(e.s_diag) * eps
    if isinstance(e, BottleneckEmissions):
        return lgc.conditional_rand_bottleneck(eps, x_point, e.H, e.h, e.C, e.c, e.s_diag)
    raise TypeError(type(e))


def dim_out(e: Emissions) -> int:
    """Observation dimension per step (static)."""
    from ..utils.fill import tindex

    e0 = tindex(e, 0)
    if isinstance(e, ScalarEmissions):
        return 1
    if isinstance(e, DenseEmissions):
        return e0.h.shape[-1]
    return e0.c.shape[-1]
