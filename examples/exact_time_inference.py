"""Exact GP time-series inference at scale.

Python/JAX analogue of the reference's exact_time_inference.jl: build a
Matern-5/2 GP, convert to state-space form, sample 1M noisy observations,
condition, and predict at 1.2M time points.
"""

from _common import scaled

import jax
import jax.numpy as jnp
import numpy as np

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import GP, Matern52, rand, to_sde
from temporalgps_tpu.gp.posterior import marginals as post_marginals
from temporalgps_tpu.gp.posterior import posterior


def main():
    T = scaled(1_000_000, 2_000)
    T_pr = scaled(1_200_000, 2_400)
    x = RegularSpacing(0.0, 1e-4, T)
    f = to_sde(GP(Matern52()))
    var_noise = 0.1

    fx = f(x, var_noise)
    y = rand(jax.random.PRNGKey(42), fx)

    f_post = posterior(fx, y)
    x_pr = RegularSpacing(0.0, 1e-4 * T / T_pr, T_pr)
    m, v = post_marginals(f_post(x_pr, var_noise))
    m, v = np.asarray(m), np.asarray(v)
    print(f"T={T} T_pr={T_pr}")
    print("posterior mean head:", m[:5])
    print("posterior std head :", np.sqrt(v[:5]))
    assert np.all(np.isfinite(m)) and np.all(v > 0)
    print("ok")


if __name__ == "__main__":
    main()
