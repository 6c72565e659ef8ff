"""Spatio-temporal LGSSM builder: grid FiniteLTISDE -> LGSSM."""

import jax.numpy as jnp

from ..gp import kernels as K
from ..gp.means import ConstMean, ZeroMean
from ..models import LGSSM, DenseEmissions, GaussMarkov
from ..utils.fill import Fill, is_fill
from . import grids
from .to_gauss_markov import lgssm_components_spacetime


def _contains_dtc(kernel) -> bool:
    from .pseudo_point import DTCSeparable

    if isinstance(kernel, DTCSeparable):
        return True
    if isinstance(kernel, (K.Scaled, K.Stretched)):
        return _contains_dtc(kernel.kernel)
    if isinstance(kernel, (K.Sum, K.Product)):
        return any(_contains_dtc(c) for c in kernel.kernels)
    return False


def build_lgssm_spacetime(fx) -> LGSSM:
    from ..gp.lti_sde import _storage_dtype

    f = fx.f
    dtype = _storage_dtype(f.storage)
    kernel = f.f.kernel
    x = fx.x

    noise_flat = fx.noise
    noise_fill = None  # per-time Fill when noise is homoscedastic on a grid
    if is_fill(noise_flat):
        nv = noise_flat.value
        if jnp.ndim(nv) == 0 and isinstance(x, grids.RectilinearGrid):
            # Keep the per-time noise leaf a Fill: the whole emission stays
            # time-invariant, enabling the lti engine (ops/lti.py) and O(1)
            # HBM noise traffic in every engine.
            noise_fill = Fill(
                jnp.full((grids.n_space(x),), nv, dtype), grids.n_time(x)
            )
        noise_flat = jnp.broadcast_to(nv, (noise_flat.N,))
    noise_tf = (
        noise_fill
        if noise_fill is not None
        else grids.noise_var_to_time_form(x, noise_flat)
    )  # (Nt, Ns) or Fill((Ns,), Nt)

    if _contains_dtc(kernel):
        from .pseudo_point import build_dtc_lgssm

        return build_dtc_lgssm(kernel, x, noise_tf, f.f.mean, dtype)

    As, offs, Qs, (Hs, hs), x0 = lgssm_components_spacetime(kernel, x, dtype)
    Nt = grids.n_time(x)

    mean_fn = f.f.mean
    if isinstance(mean_fn, ConstMean):
        from ..gp.lti_sde import _combine_leaves

        c = jnp.asarray(mean_fn.c, dtype)
        hs = _combine_leaves(lambda h: h + c, [hs], Nt)
    elif not isinstance(mean_fn, ZeroMean):
        raise NotImplementedError(
            "spatio-temporal models support ZeroMean/ConstMean mean functions"
        )

    det = _temporal_det(kernel)
    if is_fill(noise_tf):
        Ns_ = noise_tf.value.shape[-1]
        S_dense = Fill(
            noise_tf.value[..., None] * jnp.eye(Ns_, dtype=dtype), noise_tf.N
        )
    else:
        S_dense = noise_tf[..., None] * jnp.eye(noise_tf.shape[-1], dtype=dtype)
    emis = DenseEmissions(H=Hs, h=hs, S=S_dense)
    return LGSSM(
        GaussMarkov(As=As, offs=offs, Qs=Qs, x0=x0, forward=True,
                    det_blocks=det),
        emis,
    )


def _temporal_det(kernel) -> bool:
    """Deterministic-diffusion flag of the TEMPORAL part of a
    spatio-temporal kernel tree."""
    from .pseudo_point import DTCSeparable
    from .separable import Separable

    if isinstance(kernel, (Separable, DTCSeparable)):
        sep = kernel.k if isinstance(kernel, DTCSeparable) else kernel
        return K.has_deterministic_component(sep.r)
    if isinstance(kernel, K.Scaled):
        return _temporal_det(kernel.kernel)
    if isinstance(kernel, (K.Sum, K.Product)):
        return any(_temporal_det(c) for c in kernel.kernels)
    return False
