"""Hyperparameter learning on a 1M-step time series.

Analogue of the reference's exact_time_learning.jl: learn (mean, kernel
variance, inverse lengthscale, noise variance) by maximising the state-space
log marginal likelihood with optax (adam), then predict.
"""

from _common import scaled

import jax
import jax.numpy as jnp
import numpy as np

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import GP, ConstMean, Matern52, logpdf, rand, to_sde
from temporalgps_tpu.gp.posterior import marginals as post_marginals
from temporalgps_tpu.gp.posterior import posterior
from temporalgps_tpu.learning import fit, positive


def build_gp(params):
    kern = (jnp.exp(params["log_var_kernel"]) * Matern52()).stretch(
        jnp.exp(params["log_lambda"])
    )
    return to_sde(GP(kern, ConstMean(params["mean"])))


def main():
    T = scaled(1_000_000, 2_000)
    x = RegularSpacing(0.0, 1e-4, T)

    true_params = {
        "mean": jnp.asarray(3.0),
        "log_var_kernel": positive(0.6),
        "log_lambda": positive(0.1),
        "log_var_noise": positive(2.0),
    }
    f_true = build_gp(true_params)
    y = rand(
        jax.random.PRNGKey(0), f_true(x, jnp.exp(true_params["log_var_noise"]))
    )

    def objective(params):
        f = build_gp(params)
        return -logpdf(
            f(x, jnp.exp(params["log_var_noise"])), y, engine="block"
        ) / T

    init = jax.tree_util.tree_map(
        lambda v: v + 0.3 * jax.random.normal(jax.random.PRNGKey(1), ()), true_params
    )
    result = fit(objective, init, steps=scaled(150, 10))
    print("loss trajectory:", np.asarray(result.losses)[:: max(1, len(result.losses) // 8)])
    learned = {k: float(v) for k, v in result.params.items()}
    print("learned:", learned)

    f_final = build_gp(result.params)
    fp = posterior(f_final(x, jnp.exp(result.params["log_var_noise"])), y)
    m, v = post_marginals(fp(x, jnp.exp(result.params["log_var_noise"])))
    assert np.all(np.isfinite(np.asarray(m)))
    print("ok")


if __name__ == "__main__":
    main()
