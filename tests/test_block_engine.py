"""Block-parallel engine vs sequential engine equivalence."""

import numpy as np
import pytest

from model_test_utils import random_lgssm, random_obs
from temporalgps_tpu.models import filter_, logpdf


@pytest.mark.parametrize("N,n_blocks", [(16, 4), (17, 4), (23, 8), (7, 16), (64, None)])
def test_logpdf_match(rng, N, n_blocks):
    model = random_lgssm(rng, kind="scalar", D=3, Dout=1, N=N, time_varying=True)
    y = random_obs(rng, model)
    lp_seq = float(logpdf(model, y, engine="sequential"))
    from temporalgps_tpu.ops import block

    lp_blk = float(block.logpdf(model, y, n_blocks=n_blocks))
    np.testing.assert_allclose(lp_blk, lp_seq, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("N,n_blocks", [(16, 4), (17, 4), (23, 8)])
def test_filter_match(rng, N, n_blocks):
    model = random_lgssm(rng, kind="scalar", D=2, Dout=1, N=N, time_varying=False)
    y = random_obs(rng, model)
    xf_seq = filter_(model, y, engine="sequential")
    from temporalgps_tpu.ops import block

    xf_blk = block.filter_(model, y, n_blocks=n_blocks)
    np.testing.assert_allclose(
        np.asarray(xf_blk.mean), np.asarray(xf_seq.mean), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(xf_blk.cov), np.asarray(xf_seq.cov), rtol=1e-8, atol=1e-10
    )


def test_grad_match(rng):
    import jax

    model = random_lgssm(rng, kind="scalar", D=2, Dout=1, N=24, time_varying=False)
    y = random_obs(rng, model)

    def canon(x):
        x = np.asarray(x)
        if x.ndim >= 2 and x.shape[-1] == x.shape[-2]:
            return 0.5 * (x + np.swapaxes(x, -1, -2))
        return x

    g_seq = jax.grad(lambda m: logpdf(m, y, engine="sequential"))(model)
    g_blk = jax.grad(lambda m: logpdf(m, y, engine="block"))(model)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_blk), jax.tree_util.tree_leaves(g_seq)
    ):
        np.testing.assert_allclose(canon(a), canon(b), rtol=1e-6, atol=1e-8)


def test_fallbacks(rng):
    """Non-scalar emissions and reverse orderings fall back to the
    associative engine with identical results."""
    model = random_lgssm(rng, kind="dense", D=3, Dout=2, N=9, time_varying=True)
    y = random_obs(rng, model)
    lp_seq = float(logpdf(model, y, engine="sequential"))
    lp_blk = float(logpdf(model, y, engine="block"))
    np.testing.assert_allclose(lp_blk, lp_seq, rtol=1e-8)


@pytest.mark.parametrize("kind,Dout", [("dense", 2), ("large", 4), ("bottleneck", 4)])
def test_vector_emissions_block_logpdf(rng, kind, Dout):
    """Generalised block engine handles vector emissions (with pad tails)."""
    from temporalgps_tpu.ops import block

    model = random_lgssm(rng, kind=kind, D=3, Dout=Dout, N=21, time_varying=True)
    y = random_obs(rng, model)
    lp_blk = float(block.logpdf(model, y, n_blocks=4))
    lp_seq = float(logpdf(model, y, engine="sequential"))
    np.testing.assert_allclose(lp_blk, lp_seq, rtol=1e-8, atol=1e-8)


BLOCK_AFFINE_CASES = [
    dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=True),
    dict(kind="scalar", D=3, Dout=1, time_varying=False, forward=True),
    dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=False),
    dict(kind="dense", D=3, Dout=2, time_varying=True, forward=True),
    dict(kind="scalar", D=5, Dout=1, time_varying=True, forward=True),  # non-lanes path
]


@pytest.mark.parametrize("case", BLOCK_AFFINE_CASES, ids=str)
def test_block_latent_marginals_match(rng, case):
    from temporalgps_tpu.models import latent_marginals, marginals_diag

    model = random_lgssm(rng, N=19, **case)
    xs_seq = latent_marginals(model, engine="sequential")
    xs_blk = latent_marginals(model, engine="block")
    np.testing.assert_allclose(
        np.asarray(xs_blk.mean), np.asarray(xs_seq.mean), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(xs_blk.cov), np.asarray(xs_seq.cov), rtol=1e-8, atol=1e-10
    )
    m_s, v_s = marginals_diag(model, engine="sequential")
    m_b, v_b = marginals_diag(model, engine="block")
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_s), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_s), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize(
    "case",
    [
        dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=True),
        dict(kind="scalar", D=2, Dout=1, time_varying=True, forward=False),
        dict(kind="dense", D=4, Dout=2, time_varying=True, forward=True),
    ],
    ids=str,
)
def test_block_rand_matches_parallel(rng, case):
    """Same key => identical sample across engines (shared eps pre-draw)."""
    import jax

    from temporalgps_tpu.models import rand

    model = random_lgssm(rng, N=21, **case)
    key = jax.random.PRNGKey(7)
    y_seq = rand(key, model, engine="sequential")
    y_blk = rand(key, model, engine="block")
    np.testing.assert_allclose(
        np.asarray(y_blk), np.asarray(y_seq), rtol=1e-8, atol=1e-9
    )


@pytest.mark.parametrize(
    "case",
    [
        dict(kind="scalar", D=3, Dout=1, time_varying=True, forward=True),
        dict(kind="large", D=2, Dout=4, time_varying=True, forward=True),
    ],
    ids=str,
)
def test_block_posterior_matches_sequential(rng, case):
    from temporalgps_tpu.models import marginals_diag, posterior

    model = random_lgssm(rng, N=23, **case)
    y = random_obs(rng, model)
    post_s = posterior(model, y, engine="sequential")
    post_b = posterior(model, y, engine="block")
    m_s, v_s = marginals_diag(post_s, engine="sequential")
    m_b, v_b = marginals_diag(post_b, engine="sequential")
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_s), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_b), np.asarray(v_s), rtol=1e-6, atol=1e-9)
    # and the full smoothing pass through the block engine itself
    m_bb, v_bb = marginals_diag(post_b, engine="block")
    np.testing.assert_allclose(np.asarray(m_bb), np.asarray(m_s), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_bb), np.asarray(v_s), rtol=1e-6, atol=1e-9)
