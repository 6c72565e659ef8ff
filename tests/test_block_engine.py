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
