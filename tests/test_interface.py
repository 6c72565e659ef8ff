"""Generic LGSSM interface harness.

Role of the reference's `test_interface` fixtures (test/test_util.jl:71-155)
and `validate_dims` (test/models/model_test_utils.jl:269-316): every driver
on every model in a (emission type x ordering x time-varying x Q
diag/dense) sweep must be self-consistent — correct shapes/dtypes, scalar
finite logpdf matching the dense oracle, filter/marginals/posterior
coherence — independent of the per-engine equivalence suites.
"""

import numpy as np
import pytest

import jax

from model_test_utils import random_lgssm_q, random_obs, validate_dims
from temporalgps_tpu.models import (
    ScalarEmissions,
    filter_,
    latent_marginals,
    logpdf,
    marginals,
    marginals_diag,
    naive,
    posterior,
    rand,
)

KINDS = ["scalar", "dense", "large", "bottleneck"]
N, D, DOUT = 5, 3, 2


def CASES():
    out = []
    for kind in KINDS:
        for forward in (True, False):
            for tv in (True, False):
                for q_diag in (True, False):
                    # trim the grid: q_diag sweeps only on time-invariant
                    # forward models (the structure axis is orthogonal to
                    # ordering/time-variation)
                    if q_diag and (tv or not forward):
                        continue
                    out.append(
                        dict(kind=kind, forward=forward, time_varying=tv,
                             q_diag=q_diag)
                    )
    return out


def _ids(c):
    return (
        f"{c['kind']}-{'fwd' if c['forward'] else 'rev'}"
        f"-{'tv' if c['time_varying'] else 'ti'}"
        f"{'-qdiag' if c['q_diag'] else ''}"
    )


@pytest.mark.parametrize("case", CASES(), ids=_ids)
def test_interface(rng, case):
    model = random_lgssm_q(rng, D=D, Dout=DOUT, N=N, **case)
    scalar = isinstance(model.emis, ScalarEmissions)
    obs_shape = (N,) if scalar else (N, DOUT)

    # dims / lengths
    validate_dims(model)
    assert len(model) == N and model.latent_dim == D

    # rand: shape, dtype, finiteness
    y_s = rand(jax.random.PRNGKey(0), model)
    assert y_s.shape == obs_shape
    assert np.all(np.isfinite(np.asarray(y_s)))

    # marginals / marginals_diag coherence
    ys = marginals(model)
    m_diag, v_diag = marginals_diag(model)
    assert np.shape(m_diag) == obs_shape and np.shape(v_diag) == obs_shape
    np.testing.assert_allclose(np.asarray(m_diag), np.asarray(ys.mean),
                               rtol=1e-9, atol=1e-12)
    cov_diag = (
        np.asarray(ys.cov)
        if scalar
        else np.diagonal(np.asarray(ys.cov), axis1=-2, axis2=-1)
    )
    np.testing.assert_allclose(np.asarray(v_diag), cov_diag, rtol=1e-9,
                               atol=1e-12)

    # marginals vs the dense oracle
    want_means, want_covs = naive.naive_marginals(model)
    for t in range(N):
        np.testing.assert_allclose(
            np.atleast_1d(np.asarray(ys.mean)[t]), want_means[t],
            rtol=1e-7, atol=1e-9,
        )
        np.testing.assert_allclose(
            np.atleast_2d(np.asarray(ys.cov)[t]), want_covs[t],
            rtol=1e-7, atol=1e-9,
        )

    # latent marginals: shapes
    xs = latent_marginals(model)
    assert xs.mean.shape == (N, D) and xs.cov.shape == (N, D, D)

    # logpdf: scalar, finite, dense-oracle match
    y = random_obs(rng, model)
    lml = logpdf(model, y)
    assert np.shape(lml) == ()
    lml = float(lml)
    assert np.isfinite(lml)
    np.testing.assert_allclose(lml, naive.naive_logpdf(model, y), rtol=1e-8)

    # filter: Gaussian chain of the right shape
    xf = filter_(model, y)
    assert xf.mean.shape == (N, D) and xf.cov.shape == (N, D, D)
    assert np.all(np.isfinite(np.asarray(xf.mean)))

    # posterior: ordering flips, length preserved, emissions kept
    post = posterior(model, y)
    assert post.trans.forward == (not model.trans.forward)
    assert len(post) == N
    assert type(post.emis) is type(model.emis)
    if model.trans.forward:
        ys_post = marginals(post)
        pw_means, pw_covs = naive.naive_posterior_marginals(model, y)
        for t in range(N):
            np.testing.assert_allclose(
                np.atleast_1d(np.asarray(ys_post.mean)[t]), pw_means[t],
                rtol=1e-6, atol=1e-8,
            )
            np.testing.assert_allclose(
                np.atleast_2d(np.asarray(ys_post.cov)[t]), pw_covs[t],
                rtol=1e-6, atol=1e-8,
            )


# ---------------------------------------------------------------------------
# Engine sweep over the full generator grid (the reference sweeps its model
# grid through one engine; here the sequential scan is ground truth and
# every parallel engine must agree on every generated model —
# test/models/lgssm.jl:15-36 crossed with this package's engine axis).
# ---------------------------------------------------------------------------

SWEEP_ENGINES = ["parallel", "block", "sqrt"]
SETTINGS = [dict(D=3, Dout=2, N=8), dict(D=5, Dout=4, N=11)]


def _sid(s):
    return f"D{s['D']}xDout{s['Dout']}xN{s['N']}"


@pytest.mark.parametrize("setting", SETTINGS, ids=_sid)
@pytest.mark.parametrize("case", CASES(), ids=_ids)
def test_engine_sweep(rng, case, setting):
    """logpdf / filter / marginals_diag / posterior across every generic
    engine on every generated model, vs the sequential scan at f64."""
    model = random_lgssm_q(rng, **case, **setting)
    y = random_obs(rng, model)
    lp0 = float(logpdf(model, y, engine="sequential"))
    xf0 = filter_(model, y, engine="sequential")
    md0, vd0 = marginals_diag(model, engine="sequential")
    for eng in SWEEP_ENGINES:
        lp = float(logpdf(model, y, engine=eng))
        np.testing.assert_allclose(lp, lp0, rtol=1e-8, err_msg=eng)
        xf = filter_(model, y, engine=eng)
        np.testing.assert_allclose(
            np.asarray(xf.mean), np.asarray(xf0.mean), rtol=1e-7, atol=1e-9,
            err_msg=eng,
        )
        md, vd = marginals_diag(model, engine=eng)
        np.testing.assert_allclose(np.asarray(md), np.asarray(md0),
                                   rtol=1e-8, atol=1e-10, err_msg=eng)
        np.testing.assert_allclose(np.asarray(vd), np.asarray(vd0),
                                   rtol=1e-8, atol=1e-10, err_msg=eng)
    if model.trans.forward:
        post0 = marginals(posterior(model, y, engine="sequential"))
        for eng in SWEEP_ENGINES:
            ys_p = marginals(posterior(model, y, engine=eng), engine=eng)
            np.testing.assert_allclose(
                np.asarray(ys_p.mean), np.asarray(post0.mean),
                rtol=1e-6, atol=1e-8, err_msg=eng,
            )


@pytest.mark.parametrize("setting", SETTINGS, ids=_sid)
@pytest.mark.parametrize("kind", ["scalar", "dense"])
def test_engine_sweep_fill(rng, kind, setting):
    """lti + steady on their supported family (forward, fully-Fill): the
    time-invariant generator axis crossed with the constant-operator
    engines. The chain is contractive (rho=0.5) so the steady gain has
    converged well inside the warmup and the approximation error sits at
    round-off."""
    N = 128
    model = random_lgssm_q(
        rng, kind=kind, D=setting["D"], Dout=setting["Dout"], N=N,
        time_varying=False, forward=True, all_fill=True, rho=0.5,
    )
    validate_dims(model)
    y = random_obs(rng, model)
    lp0 = float(logpdf(model, y, engine="sequential"))
    lp_lti = float(logpdf(model, y, engine="lti"))
    np.testing.assert_allclose(lp_lti, lp0, rtol=1e-8, err_msg="lti")
    lp_st = float(logpdf(model, y, engine="steady", n_warmup=64))
    np.testing.assert_allclose(lp_st, lp0, rtol=1e-7, err_msg="steady")
    md0, vd0 = marginals_diag(model, engine="sequential")
    for eng in ("lti", "steady"):
        md, vd = marginals_diag(model, engine=eng)
        np.testing.assert_allclose(np.asarray(md), np.asarray(md0),
                                   rtol=1e-6, atol=1e-9, err_msg=eng)
        np.testing.assert_allclose(np.asarray(vd), np.asarray(vd0),
                                   rtol=1e-6, atol=1e-9, err_msg=eng)
