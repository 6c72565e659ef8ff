"""Random-model generators for LGSSM tests.

Mirrors the role of the reference's test/models/model_test_utils.jl:163-263:
parameterised random LGSSMs over (ordering, time-varying?, emission type,
Dlat, Dobs, N).
"""

import numpy as np

from temporalgps_tpu.models import (
    LGSSM,
    BottleneckEmissions,
    DenseEmissions,
    GaussMarkov,
    LargeEmissions,
    ScalarEmissions,
)
from temporalgps_tpu.utils import Fill, Gaussian


def random_psd(rng, D, scale=1.0):
    X = rng.standard_normal((D, D + 2))
    return scale * (X @ X.T / (D + 2) + 0.5 * np.eye(D))


def random_stable_A(rng, D):
    A = rng.standard_normal((D, D)) / np.sqrt(D)
    # keep spectral radius < 1 for well-conditioned chains
    ev = np.max(np.abs(np.linalg.eigvals(A)))
    return 0.9 * A / max(ev, 1.0)


def random_gauss_markov(rng, D, N, *, time_varying=True, forward=True):
    if time_varying:
        As = np.stack([random_stable_A(rng, D) for _ in range(N)])
        offs = rng.standard_normal((N, D)) * 0.3
        Qs = np.stack([random_psd(rng, D) for _ in range(N)])
    else:
        As = Fill(random_stable_A(rng, D), N)
        offs = Fill(rng.standard_normal(D) * 0.3, N)
        Qs = Fill(random_psd(rng, D), N)
    x0 = Gaussian(rng.standard_normal(D), random_psd(rng, D))
    return GaussMarkov(As=As, offs=offs, Qs=Qs, x0=x0, forward=forward)


def random_emissions(rng, kind, D, Dout, N, *, time_varying=True,
                     all_fill=False):
    """all_fill=True additionally makes the NOISE leaf Fill (time-invariant
    emissions throughout) — required by the lti/steady engine contract."""
    if kind == "scalar":
        if time_varying:
            return ScalarEmissions(
                H=rng.standard_normal((N, D)),
                h=rng.standard_normal(N) * 0.2,
                s=0.1 + rng.random(N),
            )
        return ScalarEmissions(
            H=Fill(rng.standard_normal(D), N),
            h=Fill(np.float64(0.1), N),
            s=Fill(np.float64(0.1 + rng.random()), N)
            if all_fill
            else 0.1 + rng.random(N),
        )
    if kind == "dense":
        if time_varying:
            return DenseEmissions(
                H=rng.standard_normal((N, Dout, D)),
                h=rng.standard_normal((N, Dout)) * 0.2,
                S=np.stack([random_psd(rng, Dout, 0.5) for _ in range(N)]),
            )
        return DenseEmissions(
            H=Fill(rng.standard_normal((Dout, D)), N),
            h=Fill(rng.standard_normal(Dout) * 0.2, N),
            S=Fill(random_psd(rng, Dout, 0.5), N)
            if all_fill
            else np.stack([random_psd(rng, Dout, 0.5) for _ in range(N)]),
        )
    if kind == "large":
        return LargeEmissions(
            C=rng.standard_normal((N, Dout, D)),
            c=rng.standard_normal((N, Dout)) * 0.2,
            s_diag=0.1 + rng.random((N, Dout)),
        )
    if kind == "bottleneck":
        M = max(1, D - 1)
        return BottleneckEmissions(
            H=rng.standard_normal((N, M, D)),
            h=rng.standard_normal((N, M)) * 0.2,
            C=rng.standard_normal((N, Dout, M)),
            c=rng.standard_normal((N, Dout)) * 0.2,
            s_diag=0.1 + rng.random((N, Dout)),
        )
    raise ValueError(kind)


def random_lgssm(
    rng, *, kind="scalar", D=3, Dout=2, N=7, time_varying=True, forward=True
):
    trans = random_gauss_markov(rng, D, N, time_varying=time_varying, forward=forward)
    emis = random_emissions(rng, kind, D, Dout, N, time_varying=time_varying)
    return LGSSM(trans, emis)


def random_obs(rng, model):
    from temporalgps_tpu.models import emissions as em

    N = len(model)
    if isinstance(model.emis, ScalarEmissions):
        return rng.standard_normal(N)
    return rng.standard_normal((N, em.dim_out(model.emis)))


def random_diag_psd(rng, D, scale=1.0):
    return np.diag(scale * (0.2 + rng.random(D)))


def random_gauss_markov_q(rng, D, N, *, time_varying=True, forward=True,
                          q_diag=False):
    """random_gauss_markov with a diagonal-Q axis (the reference sweeps
    Q dense vs Diagonal, test/models/lgssm.jl:15-36)."""
    make_q = random_diag_psd if q_diag else random_psd
    if time_varying:
        As = np.stack([random_stable_A(rng, D) for _ in range(N)])
        offs = rng.standard_normal((N, D)) * 0.3
        Qs = np.stack([make_q(rng, D) for _ in range(N)])
    else:
        As = Fill(random_stable_A(rng, D), N)
        offs = Fill(rng.standard_normal(D) * 0.3, N)
        Qs = Fill(make_q(rng, D), N)
    x0 = Gaussian(rng.standard_normal(D), random_psd(rng, D))
    return GaussMarkov(As=As, offs=offs, Qs=Qs, x0=x0, forward=forward)


def random_lgssm_q(rng, *, kind="scalar", D=3, Dout=2, N=7, time_varying=True,
                   forward=True, q_diag=False, all_fill=False, rho=None):
    """rho: optional spectral-radius cap override for the transition (the
    steady-engine sweep uses a contractive chain so the constant-gain
    approximation converges well inside a short warmup)."""
    trans = random_gauss_markov_q(
        rng, D, N, time_varying=time_varying, forward=forward, q_diag=q_diag
    )
    if rho is not None:
        from temporalgps_tpu.utils.fill import is_fill

        def shrink(A):
            v = A.value if is_fill(A) else A
            ev = np.max(np.abs(np.linalg.eigvals(np.asarray(v))))
            v = np.asarray(v) * (rho / max(ev, 1e-12))
            return Fill(v, len(trans)) if is_fill(A) else v

        trans = GaussMarkov(
            As=shrink(trans.As), offs=trans.offs, Qs=trans.Qs, x0=trans.x0,
            forward=trans.forward,
        )
    emis = random_emissions(
        rng, kind, D, Dout, N, time_varying=time_varying, all_fill=all_fill
    )
    return LGSSM(trans, emis)


# ---------------------------------------------------------------------------
# Internal-consistency validation (role of the reference's validate_dims,
# test/models/model_test_utils.jl:269-316).
# ---------------------------------------------------------------------------


def _leaf_shape(leaf):
    from temporalgps_tpu.utils.fill import is_fill

    return np.shape(leaf.value) if is_fill(leaf) else np.shape(leaf)[1:]


def validate_dims(model):
    """Assert every per-step parameter of the model has mutually consistent
    shapes and time lengths."""
    from temporalgps_tpu.models import emissions as em
    from temporalgps_tpu.utils.fill import time_length

    N = len(model)
    D = model.latent_dim
    t = model.trans
    assert time_length(t.As) == N and time_length(t.offs) == N
    assert time_length(t.Qs) == N and time_length(model.emis) == N
    assert _leaf_shape(t.As) == (D, D)
    assert _leaf_shape(t.offs) == (D,)
    assert _leaf_shape(t.Qs) == (D, D)
    assert np.shape(t.x0.mean) == (D,)
    assert np.shape(t.x0.cov) == (D, D)

    e = model.emis
    Dout = em.dim_out(e)
    if isinstance(e, ScalarEmissions):
        assert Dout == 1
        assert _leaf_shape(e.H) == (D,)
        assert _leaf_shape(e.h) == () and _leaf_shape(e.s) == ()
    elif isinstance(e, DenseEmissions):
        assert _leaf_shape(e.H) == (Dout, D)
        assert _leaf_shape(e.h) == (Dout,)
        assert _leaf_shape(e.S) == (Dout, Dout)
    elif isinstance(e, LargeEmissions):
        assert _leaf_shape(e.C) == (Dout, D)
        assert _leaf_shape(e.c) == (Dout,)
        assert _leaf_shape(e.s_diag) == (Dout,)
    elif isinstance(e, BottleneckEmissions):
        M = _leaf_shape(e.H)[0]
        assert _leaf_shape(e.H) == (M, D)
        assert _leaf_shape(e.h) == (M,)
        assert _leaf_shape(e.C) == (Dout, M)
        assert _leaf_shape(e.c) == (Dout,)
        assert _leaf_shape(e.s_diag) == (Dout,)
    else:
        raise TypeError(type(e))
