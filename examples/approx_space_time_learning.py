"""Pseudo-point spatio-temporal learning on ragged data.

Analogue of the reference's approx_space_time_learning.jl: RegularInTime
(different spatial points per time slice), ELBO objective, optax learning
loop, then approximate posterior prediction.
"""

from _common import scaled

import jax
import jax.numpy as jnp
import numpy as np

from temporalgps_tpu.gp import EQ, GP, Matern52, to_sde
from temporalgps_tpu.learning import fit, positive
from temporalgps_tpu.space_time import (
    Separable,
    approx_posterior_marginals,
    elbo,
    regular_in_time,
)


def build_gp(params):
    k_space = EQ().stretch(jnp.exp(params["log_inv_len_space"]))
    k_time = Matern52().stretch(jnp.exp(params["log_inv_len_time"]))
    kern = jnp.exp(params["log_var_kernel"]) * Separable(k_space, k_time)
    return to_sde(GP(kern))


def main():
    rng = np.random.default_rng(0)
    Nt = scaled(1_000, 25)
    M = scaled(5, 3)
    max_pts = scaled(50, 5)
    ts = np.cumsum(0.01 + rng.random(Nt) * 0.01)
    vs = [np.sort(rng.uniform(-3, 3, rng.integers(max_pts // 2, max_pts + 1))) for _ in range(Nt)]
    x = regular_in_time(ts, vs)
    n_obs = len(x)
    y = jnp.asarray(rng.standard_normal(n_obs))
    z = jnp.linspace(-3.0, 3.0, M)

    def objective(params):
        f = build_gp(params)
        fx = f(x, jnp.exp(params["log_var_noise"]))
        return -elbo(fx, y, z) / n_obs

    init = {
        "log_var_kernel": positive(1.0),
        "log_inv_len_space": positive(1.0),
        "log_inv_len_time": positive(1.0),
        "log_var_noise": positive(0.5),
    }
    result = fit(objective, init, steps=scaled(75, 6))
    print("learned:", {k: float(np.exp(v)) for k, v in result.params.items()})

    f_final = build_gp(result.params)
    fx = f_final(x, jnp.exp(result.params["log_var_noise"]))
    r_pr = jnp.linspace(-3.0, 3.0, scaled(25, 7))
    m, v = approx_posterior_marginals(fx, y, z, r_pr)
    assert np.all(np.isfinite(np.asarray(m)))
    print("ok")


if __name__ == "__main__":
    main()
