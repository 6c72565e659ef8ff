"""Exact spatio-temporal compiler: Separable kernel on a grid -> LGSSM.

Mirror of the reference (reference: src/space_time/to_gauss_markov.jl:1-24):
the temporal SSM is tensored with the spatial covariance —

    As = I_Nr (x) A_t,  Qs = (Kr + eps I) (x) Q_t,  Hs = I_Nr (x) H_t,
    x0 = N(0, Kr (x) P_t)

The Kronecker products are materialised (state dim Ns * Dt), exactly as the
reference does; Fill-ness of the temporal components is preserved so regular
time grids keep O(1) parameter storage.
"""

import jax.numpy as jnp

from ..gp import kernels as K
from ..gp.lti_sde import lgssm_components as temporal_lgssm_components
from ..gp.lti_sde import _combine_leaves
from ..utils import psd
from ..utils.fill import Fill
from ..utils.gaussian import Gaussian
from ..utils.regular_spacing import num_times
from . import grids
from .separable import Separable


def _kron(A, B):
    if A.ndim == 2 and B.ndim == 2:
        return jnp.kron(A, B)
    return K._batched_kron(A, B)


def lgssm_components_spacetime(kernel, x, dtype):
    """Recursive spatio-temporal compiler -> (As, offs, Qs, emission, x0).

    Handles Separable directly, and Scaled / Sum by recursion (mirroring
    reference: src/gp/lti_sde.jl:334-436 which is type-generic)."""
    N = grids.n_time(x)
    if isinstance(kernel, K.Scaled):
        As, offs, Qs, (Hs, hs), x0 = lgssm_components_spacetime(kernel.kernel, x, dtype)
        sigma = jnp.sqrt(jnp.asarray(kernel.sigma2, dtype))
        Hs = _combine_leaves(lambda H: sigma * H, [Hs], N)
        hs = _combine_leaves(lambda h: sigma * h, [hs], N)
        return As, offs, Qs, (Hs, hs), x0
    if isinstance(kernel, K.Sum):
        parts = [lgssm_components_spacetime(c, x, dtype) for c in kernel.kernels]
        As = _combine_leaves(lambda *ms: psd.block_diag(list(ms)), [p[0] for p in parts], N)
        offs = _combine_leaves(
            lambda *vs: jnp.concatenate(vs, axis=-1), [p[1] for p in parts], N
        )
        Qs = _combine_leaves(lambda *ms: psd.block_diag(list(ms)), [p[2] for p in parts], N)
        Hs = _combine_leaves(
            lambda *ms: jnp.concatenate(ms, axis=-1), [p[3][0] for p in parts], N
        )
        hs = _combine_leaves(lambda *vs: sum(vs), [p[3][1] for p in parts], N)
        x0 = Gaussian(
            jnp.concatenate([p[4].mean for p in parts], axis=-1),
            psd.block_diag([p[4].cov for p in parts]),
        )
        return As, offs, Qs, (Hs, hs), x0
    if not isinstance(kernel, Separable):
        raise TypeError(
            f"spatio-temporal inference requires Separable-based kernels, got {type(kernel).__name__}"
        )
    if not isinstance(x, grids.RectilinearGrid):
        raise TypeError("exact spatio-temporal inference requires a RectilinearGrid")

    ts = grids.get_times(x)
    As_t, offs_t, Qs_t, (Hs_t, hs_t), x0_t = temporal_lgssm_components(
        kernel.r, ts, dtype
    )
    Kr_raw = K.gram(kernel.l, x.xl)
    # dtype-aware jitter: 1e-12 (f64, as the reference) / 1e-5 (f32), scaled
    # by the mean diagonal so ill-conditioned spatial grams stay PSD.
    eps = psd.dtype_jitter(dtype) * jnp.mean(jnp.diagonal(Kr_raw))
    Kr = (Kr_raw + eps * jnp.eye(Kr_raw.shape[0], dtype=Kr_raw.dtype)).astype(dtype)
    Kr_eps = Kr
    Ns = Kr.shape[0]
    ident = jnp.eye(Ns, dtype=dtype)

    As = _combine_leaves(lambda A: _kron(ident, A), [As_t], N)
    offs = _combine_leaves(lambda a: jnp.tile(a, Ns), [offs_t], N)
    Qs = _combine_leaves(lambda Q: _kron(Kr_eps, Q), [Qs_t], N)
    # H_t is a (Dt,) row; the emission matrix is I_Ns (x) H_t^T -> (Ns, Ns*Dt).
    Hs = _combine_leaves(lambda H: _kron(ident, H[None, :]), [Hs_t], N)
    hs = _combine_leaves(lambda h: jnp.broadcast_to(h, (Ns,)), [hs_t], N)
    x0 = Gaussian(
        jnp.tile(x0_t.mean, Ns), psd.symmetrize(_kron(Kr, x0_t.cov)).astype(dtype)
    )
    return As, offs, Qs, (Hs, hs), x0
