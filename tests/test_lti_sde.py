"""API-layer oracle tests: state-space GP vs the naive dense GP.

Mirrors the reference's central test (test/gp/lti_sde.jl:87-201): the same
model built twice — dense O(N^3) gram path and to_sde state-space path —
must agree on marginals and logpdf to tight tolerance, across a
kernel x mean x spacing x noise grid.
"""

import numpy as np
import pytest

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import (
    GP,
    ApproxPeriodic,
    ConstMean,
    Constant,
    Cosine,
    CustomMean,
    Matern12,
    Matern32,
    Matern52,
    ZeroMean,
    dense,
    logpdf,
    marginals,
    rand,
    to_sde,
)

N = 13


def KERNELS():
    return [
        ("matern12", Matern12()),
        ("matern32", Matern32()),
        ("matern52", Matern52()),
        ("cosine", Cosine()),
        ("constant", Constant(1.3)),
        ("scaled", 0.5 * Matern32()),
        ("stretched", Matern32().stretch(1.1)),
        ("scaled-stretched", 1.5 * Matern12().stretch(0.1)),
        ("approx-periodic", ApproxPeriodic(1.0)),
        ("product", (1.5 * Matern52() * Matern32()).stretch(0.99)),
        ("product-constant", 3.0 * Matern32() * Matern52() * Constant(1.0)),
        ("sum", 1.5 * Matern12().stretch(0.1) + 0.3 * Matern32().stretch(1.1)),
        ("sum3", 2.0 * Matern32() + 0.5 * Matern52() + Constant(1.0)),
    ]


def SPACINGS(rng):
    xs = np.sort(rng.uniform(0.0, 4.0, N))
    return [
        ("regular", RegularSpacing(0.0, 0.3, N)),
        ("irregular", xs),
    ]


def NOISES(rng):
    return [
        ("homoscedastic", 0.1),
        ("heteroscedastic", 0.1 + rng.random(N)),
    ]


MEANS = [
    ("zero", ZeroMean()),
    ("const", ConstMean(3.0)),
    ("custom", CustomMean(lambda x: 2.0 * x)),
]


def _check_case(rng, kernel, mean_fn, x, noise, rtol=1e-7):
    f = to_sde(GP(kernel, mean_fn))
    fx = f(x, noise)
    m_got, v_got = marginals(fx)
    m_want, v_want = dense.dense_marginals(fx)
    np.testing.assert_allclose(np.asarray(m_got), np.asarray(m_want), rtol=rtol, atol=1e-8)
    np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_want), rtol=rtol, atol=1e-8)
    y = rng.standard_normal(N) + np.asarray(m_want)
    lp_got = float(logpdf(fx, y))
    lp_want = float(dense.dense_logpdf(fx, y))
    np.testing.assert_allclose(lp_got, lp_want, rtol=rtol, atol=1e-6)


@pytest.mark.parametrize("kname,kernel", KERNELS(), ids=[k for k, _ in KERNELS()])
def test_prior_vs_dense_kernel_grid(rng, kname, kernel):
    for sname, x in SPACINGS(rng):
        _check_case(rng, kernel, ZeroMean(), x, 0.1)


@pytest.mark.parametrize("mname,mean_fn", MEANS, ids=[m for m, _ in MEANS])
def test_prior_vs_dense_means_and_noise(rng, mname, mean_fn):
    for sname, x in SPACINGS(rng):
        for nname, noise in NOISES(rng):
            _check_case(rng, Matern32(), mean_fn, x, noise)


def test_rand_shapes_and_moments(rng):
    import jax

    f = to_sde(GP(Matern52(), ConstMean(1.0)))
    x = RegularSpacing(0.0, 0.25, N)
    fx = f(x, 0.3)
    keys = jax.random.split(jax.random.PRNGKey(0), 3000)
    ys = np.asarray(jax.vmap(lambda k: rand(k, fx))(keys))
    assert ys.shape == (3000, N)
    m, v = marginals(fx)
    np.testing.assert_allclose(ys.mean(0), np.asarray(m), atol=0.12)
    np.testing.assert_allclose(ys.var(0), np.asarray(v), rtol=0.15)


def test_approx_periodic_small_r_oracle(rng):
    """Small lengthscale exercises the large-x Bessel branch: r = 0.05 puts
    x = 1/(4 r^2) = 100, far beyond the ascending series' stable range
    (reference uses Bessels.besseli, src/gp/lti_sde.jl:302). n_cos is raised
    to 50 so the cosine-series truncation error (~exp(-n^2/2x)/sqrt(2 pi x))
    sits below tolerance; the oracle is the EXACT periodic gram."""
    kern = 0.7 * ApproxPeriodic(0.05, n_cos=50)
    _check_case(rng, kern, ZeroMean(), RegularSpacing(0.0, 0.3, N), 0.1, rtol=2e-6)


def test_besseli_scaled_vs_scipy():
    """Unit-level check of e^{-x} I_n(x) across both branches (ascending
    series and Hankel asymptotic) against scipy.special.ive."""
    scipy_special = pytest.importorskip("scipy.special")
    import jax.numpy as jnp

    from temporalgps_tpu.gp.kernels import _besseli_scaled

    for n in [0, 1, 3, 6, 7, 10]:
        for x in [0.5, 5.0, 25.0, 29.9, 30.1, 50.0, 100.0, 1000.0, 1e4]:
            got = float(_besseli_scaled(n, jnp.float64(x)))
            want = float(scipy_special.ive(n, x))
            np.testing.assert_allclose(got, want, rtol=1e-9, err_msg=f"n={n} x={x}")


def test_logpdf_missing_data(rng):
    """NaNs are treated as missing: logpdf must equal the dense logpdf of the
    observed subset (reference: test/models/missings.jl semantics)."""
    f = to_sde(GP(Matern32()))
    xs = np.sort(rng.uniform(0.0, 4.0, N))
    noise = 0.1 + rng.random(N)
    fx = f(xs, noise)
    y = rng.standard_normal(N)
    missing_idx = np.asarray([2, 5, 6])
    y_miss = y.copy()
    y_miss[missing_idx] = np.nan
    lp_got = float(logpdf(fx, y_miss))
    keep = np.setdiff1d(np.arange(N), missing_idx)
    fx_obs = f(xs[keep], noise[keep])
    lp_want = float(dense.dense_logpdf(fx_obs, y[keep]))
    np.testing.assert_allclose(lp_got, lp_want, rtol=1e-6, atol=1e-6)


def test_gradients_logpdf_hyperparams(rng):
    """Reverse-mode gradient of logpdf w.r.t. kernel hyperparameters exists,
    is finite, and matches finite differences (role of Mooncake test_rule,
    reference: test/test_util.jl:34-57)."""
    import jax
    import jax.numpy as jnp

    xs = np.sort(rng.uniform(0.0, 4.0, N))
    y = rng.standard_normal(N)

    def loss(log_params):
        s2, scale, noise = jnp.exp(log_params)
        kern = (s2 * Matern52()).stretch(scale)
        fx = to_sde(GP(kern))(xs, noise)
        return logpdf(fx, y)

    p0 = jnp.zeros(3)
    g = jax.grad(loss)(p0)
    assert np.all(np.isfinite(np.asarray(g)))
    eps = 1e-6
    for i in range(3):
        d = np.zeros(3)
        d[i] = eps
        fd = (loss(p0 + d) - loss(p0 - d)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4, atol=1e-6)


def test_deterministic_block_flag_and_f32_noise_floor():
    """Kernels with zero-diffusion atoms set GaussMarkov.det_blocks, and f32
    storage floors ONLY their process noise (Materns stay exact; f64 always
    exact). Regression for the all-engine NaN at D=19, N=1e6 f32."""
    import jax.numpy as jnp
    import numpy as np

    from temporalgps_tpu import RegularSpacing
    from temporalgps_tpu.gp import (
        GP,
        ApproxPeriodic,
        ArrayStorage,
        Cosine,
        Matern52,
        to_sde,
    )
    from temporalgps_tpu.gp import kernels as K
    from temporalgps_tpu.gp.lti_sde import build_lgssm

    assert K.has_deterministic_component(Cosine())
    assert K.has_deterministic_component(Matern52() + 0.3 * ApproxPeriodic(0.5))
    assert not K.has_deterministic_component(Matern52() + Matern52().stretch(2.0))

    x32 = RegularSpacing(jnp.asarray(0.0, jnp.float32), jnp.asarray(0.01, jnp.float32), 16)
    x64 = RegularSpacing(0.0, 0.01, 16)
    ksum = Matern52() + 0.3 * ApproxPeriodic(0.5)

    m = build_lgssm(to_sde(GP(ksum), ArrayStorage(jnp.float32))(x32, jnp.asarray(0.1, jnp.float32)))
    assert m.trans.det_blocks
    Q = np.asarray(m.trans.Qs.value)
    # periodic blocks (trailing) floored strictly positive; Matern block
    # keeps its (tiny but unfloored) leading diagonal
    assert np.diag(Q)[-1] > 0
    m_mat = build_lgssm(
        to_sde(GP(Matern52()), ArrayStorage(jnp.float32))(x32, jnp.asarray(0.1, jnp.float32))
    )
    assert not m_mat.trans.det_blocks
    m64_mat = build_lgssm(to_sde(GP(Matern52()), ArrayStorage(jnp.float64))(x64, jnp.asarray(0.1)))
    # f32 Matern Q equals the f64 discretisation cast (no floor); compare
    # loosely (dt itself is f32 in the f32 model)
    np.testing.assert_allclose(
        np.asarray(m_mat.trans.Qs.value),
        np.asarray(m64_mat.trans.Qs.value).astype(np.float32),
        rtol=1e-2, atol=0,
    )
    # f64 deterministic blocks stay exactly zero-diffusion
    m64 = build_lgssm(to_sde(GP(ksum), ArrayStorage(jnp.float64))(x64, jnp.asarray(0.1)))
    assert float(np.diag(np.asarray(m64.trans.Qs.value))[-1]) == 0.0


def test_to_sde_matrices_generate_closed_form_transitions():
    """expm(F*dt) must reproduce the closed-form discrete transitions the
    runtime actually uses (sde_atoms), across leaf AND composite kernels
    (Sum/Product/ApproxPeriodic — reference: src/gp/lti_sde.jl:281-294,
    377-436); q is validated by the Lyapunov stationarity residual
    F P_inf + P_inf F' + q e e' = 0 for the companion-form Materns."""
    import jax.numpy as jnp
    import scipy.linalg as sla

    from temporalgps_tpu.gp import kernels as Kmod

    dt = 0.37
    cases = [
        Matern12(), Matern32(), Matern52(), Cosine(),
        (0.7 * Matern32()).stretch(1.3),
        ApproxPeriodic(0.8, n_cos=4),
        Matern32() * Matern12(),
        Matern52() + Matern12(),
        Matern32() + ApproxPeriodic(0.9, n_cos=3),
    ]
    for k in cases:
        F, q, H = Kmod.to_sde_matrices(k)
        if isinstance(k, Kmod.Sum):
            # sde_atoms(Sum) is deliberately composed at the lgssm level;
            # the closed-form transition is the per-component direct sum
            A_closed = sla.block_diag(*[
                np.asarray(Kmod.sde_atoms(c, jnp.float64).transition(
                    jnp.asarray(dt)))
                for c in k.kernels
            ])
        else:
            atoms = Kmod.sde_atoms(k, jnp.float64)
            A_closed = np.asarray(atoms.transition(jnp.asarray(dt)))
        A_expm = sla.expm(np.asarray(F) * dt)
        np.testing.assert_allclose(A_expm, A_closed, atol=1e-12)
        D = np.asarray(F).shape[0]
        assert np.asarray(H).shape == (D,)

    # q stationarity for the companion-form Materns: L = last unit vector
    for k in (Matern12(), Matern32(), Matern52()):
        F, q, H = Kmod.to_sde_matrices(k)
        P = np.asarray(Kmod.sde_atoms(k, jnp.float64).P_inf)
        Fn = np.asarray(F)
        D = Fn.shape[0]
        L = np.zeros((D, 1)); L[-1, 0] = 1.0
        resid = Fn @ P + P @ Fn.T + float(q) * (L @ L.T)
        np.testing.assert_allclose(resid, np.zeros_like(resid), atol=1e-9)


def test_separable_offgrid_pairwise_gram(rng):
    """Off-grid tuple-input Separable evaluation (reference:
    src/space_time/separable_kernel.jl:9-41): on grid-ordered points it
    must reproduce the grid gram; cross and diag variants agree with the
    dense gram."""
    import jax.numpy as jnp

    from temporalgps_tpu.space_time import RectilinearGrid, Separable
    from temporalgps_tpu.space_time import separable as sep
    from temporalgps_tpu.gp import EQ

    k = Separable(EQ(), Matern52())
    ns, nt = 4, 5
    r = jnp.asarray(np.linspace(-1, 1, ns))
    ts = RegularSpacing(0.0, 0.3, nt)
    grid = RectilinearGrid(r, ts)
    Kg = np.asarray(sep.gram_grid(k, grid))

    # flat space-fastest points of the same grid
    tarr = np.asarray(0.0 + 0.3 * np.arange(nt))
    xs = jnp.asarray(np.tile(np.asarray(r), nt))
    tt = jnp.asarray(np.repeat(tarr, ns))
    Kp = np.asarray(sep.gram_points(k, (xs, tt)))
    np.testing.assert_allclose(Kp, Kg, atol=1e-12)

    # off-grid cross gram and elementwise diag
    xs2 = jnp.asarray(rng.uniform(-1, 1, 7))
    tt2 = jnp.asarray(rng.uniform(0, 2, 7))
    Kc = np.asarray(sep.gram_points(k, (xs, tt), (xs2, tt2)))
    assert Kc.shape == (ns * nt, 7)
    from temporalgps_tpu.gp.kernels import gram
    want = np.asarray(gram(k.l, xs, xs2)) * np.asarray(gram(k.r, tt, tt2))
    np.testing.assert_allclose(Kc, want, atol=1e-12)

    d_un = np.asarray(sep.gram_diag_points(k, (xs2, tt2)))
    np.testing.assert_allclose(d_un, np.ones(7), atol=1e-12)
    d_bi = np.asarray(sep.gram_diag_points(k, (xs2, tt2),
                                           (jnp.flip(xs2), jnp.flip(tt2))))
    want_bi = np.asarray([
        float(gram(k.l, xs2[i][None], xs2[6 - i][None])[0, 0]
              * gram(k.r, tt2[i][None], tt2[6 - i][None])[0, 0])
        for i in range(7)
    ])
    np.testing.assert_allclose(d_bi, want_bi, atol=1e-12)
