"""Hyperparameter learning for an exact spatio-temporal model.

Analogue of the reference's exact_space_time_learning.jl: learn kernel
variance, spatial/temporal inverse lengthscales, and noise variance on a
space x time grid by maximising the exact state-space lml.
"""

from _common import scaled

import jax
import jax.numpy as jnp
import numpy as np

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import EQ, GP, Matern52, logpdf, rand, to_sde
from temporalgps_tpu.learning import fit, positive
from temporalgps_tpu.space_time import RectilinearGrid, Separable


def build_gp(params):
    k_space = EQ().stretch(jnp.exp(params["log_inv_len_space"]))
    k_time = Matern52().stretch(jnp.exp(params["log_inv_len_time"]))
    kern = jnp.exp(params["log_var_kernel"]) * Separable(k_space, k_time)
    return to_sde(GP(kern))


def main():
    Ns = scaled(50, 5)
    Nt = scaled(1_000, 30)
    r = jnp.linspace(-3.0, 3.0, Ns)
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.02, Nt))

    true_params = {
        "log_var_kernel": positive(0.8),
        "log_inv_len_space": positive(0.9),
        "log_inv_len_time": positive(1.2),
        "log_var_noise": positive(0.3),
    }
    y = rand(
        jax.random.PRNGKey(0),
        build_gp(true_params)(x, jnp.exp(true_params["log_var_noise"])),
    )

    def objective(params):
        f = build_gp(params)
        return -logpdf(f(x, jnp.exp(params["log_var_noise"])), y) / (Ns * Nt)

    init = jax.tree_util.tree_map(lambda v: v + 0.2, true_params)
    result = fit(objective, init, steps=scaled(100, 8))
    print("learned:", {k: float(np.exp(v)) for k, v in result.params.items()})
    assert np.isfinite(float(result.losses[-1]))
    print("ok")


if __name__ == "__main__":
    main()
