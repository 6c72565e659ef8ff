"""Exact spatio-temporal inference on a space x time grid.

Analogue of the reference's exact_space_time_inference.jl: Separable(EQ,
Matern-5/2) kernel on a 50-space x 1000-time grid; condition on noisy data
and predict at the same spatial grid over an extended time horizon.
"""

from _common import scaled

import jax
import jax.numpy as jnp
import numpy as np

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import EQ, GP, Matern52, rand, to_sde
from temporalgps_tpu.gp.posterior import marginals as post_marginals
from temporalgps_tpu.gp.posterior import posterior
from temporalgps_tpu.space_time import RectilinearGrid, Separable


def main():
    Ns = scaled(50, 6)
    Nt = scaled(1_000, 40)
    r = jnp.linspace(-3.0, 3.0, Ns)
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.01, Nt))
    k = Separable(EQ().stretch(0.7), Matern52())
    f = to_sde(GP(k))
    var_noise = 0.1

    fx = f(x, var_noise)
    y = rand(jax.random.PRNGKey(0), fx)
    print("sampled", y.shape)

    fp = posterior(fx, y)
    # predict over an extended time horizon at the same spatial grid
    Nt_pr = scaled(1_200, 50)
    x_pr = RectilinearGrid(r, RegularSpacing(0.0, 0.01 * Nt / Nt_pr, Nt_pr))
    m, v = post_marginals(fp(x_pr, var_noise))
    m, v = np.asarray(m), np.asarray(v)
    assert m.shape == (Ns * Nt_pr,)
    assert np.all(np.isfinite(m)) and np.all(v > 0)
    print("posterior mean/std head:", m[:4], np.sqrt(v[:4]))
    print("ok")


if __name__ == "__main__":
    main()
