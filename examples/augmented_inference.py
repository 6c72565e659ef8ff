"""Non-Gaussian likelihoods via variable augmentation.

Analogue of the reference's augmented_inference.jl: binary classification
with a logistic link, handled by the Polya-Gamma-style augmentation of
Galy-Fajou et al. (2020) — each CAVI iteration is a heteroscedastic-noise GP
posterior, which the state-space machinery computes in O(N).
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
    T = scaled(1_000, 300)
    x = RegularSpacing(0.0, 1e-1, T)
    f = to_sde(GP(Matern52()))

    key = jax.random.PRNGKey(0)
    f_true = rand(key, f(x, 0.01))
    probs = jax.nn.sigmoid(f_true)
    y = (jax.random.uniform(jax.random.PRNGKey(1), (T,)) < probs).astype(jnp.float64)
    y_sign = 2.0 * y - 1.0

    gamma = 0.5
    g = 0.5 * y_sign
    beta = 0.0

    omega = jnp.ones(T)
    for _ in range(scaled(8, 5)):
        Lam = 2.0 * gamma * omega
        pseudo_noise = 1.0 / Lam
        pseudo_obs = (g + beta * omega) / Lam
        fp = posterior(f(x, pseudo_noise), pseudo_obs)
        m, v = post_marginals(fp(x, 1e-12))
        c = jnp.sqrt(v + m**2) / 2.0
        omega = 0.5 * jnp.tanh(c) / c

    # Final posterior predictive class probabilities.
    Lam = 2.0 * gamma * omega
    fp = posterior(f(x, 1.0 / Lam), (g + beta * omega) / Lam)
    m, v = post_marginals(fp(x, 1e-12))
    p_hat = jax.nn.sigmoid(np.asarray(m) / np.sqrt(1 + np.pi * np.asarray(v) / 8))
    acc = float(np.mean((p_hat > 0.5) == np.asarray(y, bool)))
    print(f"train accuracy vs sampled labels: {acc:.3f}")
    assert acc > 0.55
    print("ok")


if __name__ == "__main__":
    main()
