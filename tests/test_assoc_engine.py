"""Parallel-prefix engine vs sequential engine equivalence.

The associative-scan engine must reproduce the sequential Kalman recursions
to float64 round-off on every driver, every emission kind, both orderings.
"""

import numpy as np
import pytest

import jax

from model_test_utils import random_lgssm, random_obs
from temporalgps_tpu.models import (
    filter_,
    latent_marginals,
    logpdf,
    marginals,
    marginals_diag,
    posterior,
    rand,
)

CASES = [
    dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=True),
    dict(kind="scalar", D=3, Dout=1, time_varying=False, forward=True),
    dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=False),
    dict(kind="dense", D=3, Dout=2, time_varying=True, forward=True),
    dict(kind="dense", D=3, Dout=2, time_varying=True, forward=False),
    dict(kind="large", D=2, Dout=4, time_varying=True, forward=True),
    dict(kind="bottleneck", D=3, Dout=4, time_varying=True, forward=True),
    # D > 3 exercises the Cholesky-congruence inverse path in the combine.
    dict(kind="scalar", D=5, Dout=1, time_varying=True, forward=True),
]


def _assert_gaussian_close(a, b, rtol=1e-8, atol=1e-8):
    np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean), rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov), rtol=rtol, atol=atol)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_logpdf_filter_match(rng, case):
    model = random_lgssm(rng, N=17, **case)
    y = random_obs(rng, model)
    lp_seq = float(logpdf(model, y, engine="sequential"))
    lp_par = float(logpdf(model, y, engine="parallel"))
    np.testing.assert_allclose(lp_par, lp_seq, rtol=1e-9, atol=1e-9)
    _assert_gaussian_close(
        filter_(model, y, engine="parallel"), filter_(model, y, engine="sequential")
    )


@pytest.mark.parametrize("case", CASES, ids=str)
def test_marginals_match(rng, case):
    model = random_lgssm(rng, N=11, **case)
    xs_seq = latent_marginals(model, engine="sequential")
    xs_par = latent_marginals(model, engine="parallel")
    _assert_gaussian_close(xs_par, xs_seq)
    ys_seq = marginals(model, engine="sequential")
    ys_par = marginals(model, engine="parallel")
    _assert_gaussian_close(ys_par, ys_seq)
    md_seq = marginals_diag(model, engine="sequential")
    md_par = marginals_diag(model, engine="parallel")
    np.testing.assert_allclose(np.asarray(md_par[0]), np.asarray(md_seq[0]), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(md_par[1]), np.asarray(md_seq[1]), rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_posterior_match(rng, case):
    model = random_lgssm(rng, N=11, **case)
    y = random_obs(rng, model)
    post_seq = posterior(model, y, engine="sequential")
    post_par = posterior(model, y, engine="parallel")
    _assert_gaussian_close(post_par.trans.x0, post_seq.trans.x0)
    for leaf_p, leaf_s in [
        (post_par.trans.As, post_seq.trans.As),
        (post_par.trans.offs, post_seq.trans.offs),
        (post_par.trans.Qs, post_seq.trans.Qs),
    ]:
        np.testing.assert_allclose(np.asarray(leaf_p), np.asarray(leaf_s), rtol=1e-7, atol=1e-8)
    # Smoothed marginals through both representations.
    _assert_gaussian_close(
        marginals(post_par, engine="parallel"),
        marginals(post_seq, engine="sequential"),
        rtol=1e-7,
        atol=1e-8,
    )


@pytest.mark.parametrize(
    "case",
    [
        dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=True),
        dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=False),
        dict(kind="dense", D=3, Dout=2, time_varying=True, forward=True),
    ],
    ids=str,
)
def test_rand_match(rng, case):
    """Same PRNG key must produce the same sample on both engines (the
    pre-drawn-noise design makes sampling deterministic given eps)."""
    model = random_lgssm(rng, N=9, **case)
    key = jax.random.PRNGKey(7)
    ys_seq = rand(key, model, engine="sequential")
    ys_par = rand(key, model, engine="parallel")
    np.testing.assert_allclose(np.asarray(ys_par), np.asarray(ys_seq), rtol=1e-8, atol=1e-8)


def test_logpdf_grad_match(rng):
    """Gradients through the parallel engine match the sequential engine."""
    import jax.numpy as jnp

    model = random_lgssm(rng, kind="scalar", D=3, Dout=1, N=13, time_varying=True)
    y = random_obs(rng, model)

    def loss(m, eng):
        return logpdf(m, y, engine=eng)

    g_seq = jax.grad(lambda m: loss(m, "sequential"))(model)
    g_par = jax.grad(lambda m: loss(m, "parallel"))(model)
    flat_seq = jax.tree_util.tree_leaves(g_seq)
    flat_par = jax.tree_util.tree_leaves(g_par)

    def canon(x):
        # logpdf depends only on sym(Q)/sym(P); engines may split the
        # cotangent between (i,j) and (j,i) differently. Compare the
        # symmetrised cotangent, which is what flows into any upstream
        # parameterisation.
        x = np.asarray(x)
        if x.ndim >= 2 and x.shape[-1] == x.shape[-2]:
            return 0.5 * (x + np.swapaxes(x, -1, -2))
        return x

    for a, b in zip(flat_par, flat_seq):
        np.testing.assert_allclose(canon(a), canon(b), rtol=1e-6, atol=1e-8)


def test_element_dense_diag_matches_dense_path(rng):
    """The input-space factorised element construction (element_dense_diag)
    must equal the dense-S construction to f64 round-off for Large and
    Bottleneck emissions."""
    import jax.numpy as jnp

    from temporalgps_tpu.ops import assoc
    from temporalgps_tpu.utils import psd

    for kind, Dout in [("large", 5), ("bottleneck", 4)]:
        model = random_lgssm(
            rng, kind=kind, D=3, Dout=Dout, N=6, time_varying=True, forward=True
        )
        y = random_obs(rng, model)
        F_ev, c_ev, Q_ev, *_ , emis_it, y_it = assoc._iteration_view(model, y)
        Hd, dd, s_diag = assoc._diag_emission_params(emis_it)
        fast = assoc.element_dense_diag(F_ev, c_ev, Q_ev, Hd, dd, s_diag, y_it)

        H, d, R = assoc._dense_emission_params(emis_it)
        S = psd.symmetrize(H @ Q_ev @ jnp.swapaxes(H, -1, -2) + R)
        Ls = psd.cholesky(S)
        K = jnp.swapaxes(psd.chol_solve(Ls, H @ Q_ev), -1, -2)
        I = jnp.eye(3, dtype=F_ev.dtype)
        ImKH = I - K @ H
        resid = y_it - (jnp.einsum("nij,nj->ni", H, c_ev) + d)
        A_e = ImKH @ F_ev
        b_e = c_ev + jnp.einsum("nij,nj->ni", K, resid)
        C_e = psd.symmetrize(ImKH @ Q_ev)
        HtSinv = jnp.swapaxes(psd.chol_solve(Ls, H), -1, -2)
        FtH = jnp.swapaxes(F_ev, -1, -2) @ HtSinv
        eta_e = jnp.einsum("nij,nj->ni", FtH, resid)
        J_e = psd.symmetrize(FtH @ H @ F_ev)

        for got, want in zip(fast, (A_e, b_e, C_e, eta_e, J_e)):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-8, atol=1e-9
            )
