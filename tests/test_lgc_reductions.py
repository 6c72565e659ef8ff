"""Reduction tests between specialised and generic conditionals
(reference: test/models/linear_gaussian_conditionals.jl:65-188) and
missing-data consistency (reference: test/models/missings.jl:70-115)."""

import numpy as np
import pytest

import jax.numpy as jnp

from model_test_utils import random_psd
from temporalgps_tpu.ops import lgc
from temporalgps_tpu.utils.gaussian import Gaussian


def _setup(rng, Din, Dout):
    x = Gaussian(
        jnp.asarray(rng.standard_normal(Din)), jnp.asarray(random_psd(rng, Din))
    )
    A = jnp.asarray(rng.standard_normal((Dout, Din)))
    a = jnp.asarray(rng.standard_normal(Dout))
    s_diag = jnp.asarray(0.2 + rng.random(Dout))
    y = jnp.asarray(rng.standard_normal(Dout))
    return x, A, a, s_diag, y


def test_large_equals_small(rng):
    """LargeOutputLGC ≈ SmallOutputLGC on identical data
    (reference: linear_gaussian_conditionals.jl:65-96)."""
    x, A, a, s_diag, y = _setup(rng, 3, 5)
    post_l, lml_l = lgc.posterior_and_lml_large(x, A, a, s_diag, y)
    post_s, lml_s = lgc.posterior_and_lml_small(x, A, a, jnp.diag(s_diag), y)
    np.testing.assert_allclose(float(lml_l), float(lml_s), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(post_l.mean), np.asarray(post_s.mean), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(post_l.cov), np.asarray(post_s.cov), rtol=1e-7, atol=1e-10
    )


def test_scalar_equals_1d_small(rng):
    """ScalarOutputLGC ≈ 1-dim SmallOutputLGC
    (reference: linear_gaussian_conditionals.jl:117-126)."""
    x, A, a, s_diag, y = _setup(rng, 3, 1)
    post_sc, lml_sc = lgc.posterior_and_lml_scalar(x, A[0], a[0], s_diag[0], y[0])
    post_sm, lml_sm = lgc.posterior_and_lml_small(x, A, a, jnp.diag(s_diag), y)
    np.testing.assert_allclose(float(lml_sc), float(lml_sm), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(post_sc.mean), np.asarray(post_sm.mean), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(post_sc.cov), np.asarray(post_sm.cov), rtol=1e-8)


def test_bottleneck_equals_flattened_small(rng):
    """BottleneckLGC ≈ flattened SmallOutputLGC with A = C H, a = C h + c
    (reference: linear_gaussian_conditionals.jl:156-188)."""
    Din, M, Dout = 4, 2, 6
    x = Gaussian(
        jnp.asarray(rng.standard_normal(Din)), jnp.asarray(random_psd(rng, Din))
    )
    H = jnp.asarray(rng.standard_normal((M, Din)))
    h = jnp.asarray(rng.standard_normal(M))
    C = jnp.asarray(rng.standard_normal((Dout, M)))
    c = jnp.asarray(rng.standard_normal(Dout))
    s_diag = jnp.asarray(0.2 + rng.random(Dout))
    y = jnp.asarray(rng.standard_normal(Dout))

    post_b, lml_b = lgc.posterior_and_lml_bottleneck(x, H, h, C, c, s_diag, y)
    A_eff = C @ H
    a_eff = C @ h + c
    post_s, lml_s = lgc.posterior_and_lml_small(x, A_eff, a_eff, jnp.diag(s_diag), y)
    np.testing.assert_allclose(float(lml_b), float(lml_s), rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(post_b.mean), np.asarray(post_s.mean), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(post_b.cov), np.asarray(post_s.cov), rtol=1e-5, atol=1e-8
    )


def test_predict_marginals_equals_predict_diag(rng):
    x, A, a, s_diag, y = _setup(rng, 3, 4)
    full = lgc.predict(x, A, a, jnp.diag(s_diag))
    m, v = lgc.predict_marginals(x, A, a, s_diag)
    np.testing.assert_allclose(np.asarray(m), np.asarray(full.mean), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(v), np.diagonal(np.asarray(full.cov)), rtol=1e-10
    )


def test_missing_step_equals_marginalized_chain(rng):
    """A chain with one missing observation == the shorter chain with the
    transitions composed through the unobserved step: A2 A1, A2 a1 + a2,
    A2 Q1 A2' + Q2 (reference: test/models/missings.jl:70-115)."""
    from temporalgps_tpu.models import LGSSM, GaussMarkov, ScalarEmissions, logpdf
    from temporalgps_tpu.models.missings import logpdf_with_missings
    from temporalgps_tpu.utils import Gaussian as G

    D = 3
    N = 5
    As = np.stack([np.eye(D) * 0.8 + 0.05 * rng.standard_normal((D, D)) for _ in range(N)])
    offs = rng.standard_normal((N, D)) * 0.2
    Qs = np.stack([random_psd(rng, D, 0.3) for _ in range(N)])
    H = rng.standard_normal((N, D))
    h = rng.standard_normal(N) * 0.1
    s = 0.2 + rng.random(N)
    x0 = G(jnp.asarray(rng.standard_normal(D)), jnp.asarray(random_psd(rng, D)))

    def model_from(As_, offs_, Qs_, H_, h_, s_):
        return LGSSM(
            GaussMarkov(
                As=jnp.asarray(As_), offs=jnp.asarray(offs_), Qs=jnp.asarray(Qs_),
                x0=x0, forward=True,
            ),
            ScalarEmissions(H=jnp.asarray(H_), h=jnp.asarray(h_), s=jnp.asarray(s_)),
        )

    y = rng.standard_normal(N)
    miss = 2  # mark step 2 missing
    y_miss = y.copy()
    y_miss[miss] = np.nan
    lp_missing = float(
        logpdf_with_missings(model_from(As, offs, Qs, H, h, s), jnp.asarray(y_miss))
    )

    # shorter chain: compose step miss and miss+1
    A1, A2 = As[miss], As[miss + 1]
    As_short = np.concatenate([As[:miss], [A2 @ A1], As[miss + 2 :]])
    offs_short = np.concatenate(
        [offs[:miss], [A2 @ offs[miss] + offs[miss + 1]], offs[miss + 2 :]]
    )
    Qs_short = np.concatenate(
        [Qs[:miss], [A2 @ Qs[miss] @ A2.T + Qs[miss + 1]], Qs[miss + 2 :]]
    )
    keep = [i for i in range(N) if i != miss]
    lp_short = float(
        logpdf(
            model_from(As_short, offs_short, Qs_short, H[keep], h[keep], s[keep]),
            jnp.asarray(y[keep]),
        )
    )
    np.testing.assert_allclose(lp_missing, lp_short, rtol=1e-6, atol=1e-7)
