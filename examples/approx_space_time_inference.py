"""Approximate (pseudo-point) spatio-temporal inference.

Analogue of the reference's approx_space_time_inference.jl: DTC approximation
with spatial inducing points on a 50 x 1000 grid; approximate posterior
marginals at a finer spatial grid.
"""

from _common import scaled

import jax
import jax.numpy as jnp
import numpy as np

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import EQ, GP, Matern52, rand, to_sde
from temporalgps_tpu.space_time import (
    RectilinearGrid,
    Separable,
    approx_posterior_marginals,
    elbo,
)


def main():
    Ns = scaled(50, 6)
    Nt = scaled(1_000, 40)
    M = scaled(10, 4)
    r = jnp.linspace(-3.0, 3.0, Ns)
    x = RectilinearGrid(r, RegularSpacing(0.0, 0.01, Nt))
    k = Separable(EQ().stretch(0.5), Matern52())
    f = to_sde(GP(k))
    var_noise = 0.1

    fx = f(x, var_noise)
    y = rand(jax.random.PRNGKey(0), fx)

    z = jnp.linspace(-3.0, 3.0, M)
    lb = float(elbo(fx, y, z))
    print("elbo:", lb)

    r_pr = jnp.linspace(-3.2, 3.2, scaled(100, 9))
    m, v = approx_posterior_marginals(fx, y, z, r_pr)
    m, v = np.asarray(m), np.asarray(v)
    assert m.shape == (len(r_pr) * Nt,)
    assert np.all(np.isfinite(m)) and np.all(v > -1e-9)
    print("approx posterior head:", m[:4], np.sqrt(np.maximum(v[:4], 0)))
    print("ok")


if __name__ == "__main__":
    main()
