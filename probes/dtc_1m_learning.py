"""BASELINE config #5 at spec scale: DTC hyperparameter LEARNING at Nt=1M.

Reference workload: examples/approx_space_time_learning.jl:44-56 (1M+
timesteps sparse inference + learning). Runs a 20-step Adam loop on the
steady-engine ELBO (regular grid, Ns=50, M=5 inducing points, f32) on the
attached v5e, then checks the loss went down and stayed finite.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tgps_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import EQ, GP, ArrayStorage, Matern52, to_sde
from temporalgps_tpu.learning import fit, positive
from temporalgps_tpu.space_time import RectilinearGrid, Separable, elbo

dtype = jnp.float32


def main():
    print(jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    Ns, Nt, M = 50, 1_000_000, 5
    r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
    z = jnp.asarray(np.linspace(-3, 3, M), dtype)
    x = RectilinearGrid(
        r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt)
    )
    n_obs = Ns * Nt
    y = jnp.asarray(rng.standard_normal(n_obs).astype(np.float32))

    def objective(params):
        k_space = EQ().stretch(jnp.exp(params["log_inv_len_space"]))
        k_time = Matern52().stretch(jnp.exp(params["log_inv_len_time"]))
        kern = jnp.exp(params["log_var_kernel"]) * Separable(k_space, k_time)
        fx = to_sde(GP(kern), ArrayStorage(dtype))(
            x, jnp.exp(params["log_var_noise"])
        )
        return -elbo(fx, y, z, engine="steady") / n_obs

    init = {
        "log_var_kernel": positive(1.0).astype(dtype),
        "log_inv_len_space": positive(1.0).astype(dtype),
        "log_inv_len_time": positive(1.0).astype(dtype),
        "log_var_noise": positive(0.5).astype(dtype),
    }
    steps = 20
    t0 = time.perf_counter()
    result = fit(objective, init, steps=steps)
    losses = np.asarray(result.losses, np.float64)
    wall = time.perf_counter() - t0
    print(f"{steps}-step Adam loop (incl. compile): {wall:.0f}s "
          f"({wall/steps*1e3:.0f} ms/step amortised-with-compile)", flush=True)
    print("losses:", np.array2string(losses, precision=5), flush=True)
    assert np.all(np.isfinite(losses)), "non-finite loss"
    assert losses[-1] < losses[0], "loss did not decrease"
    print("learned:", {k: float(np.exp(np.asarray(v))) for k, v in
                       result.params.items()}, flush=True)
    # amortised per-step timing, post-compile
    t0 = time.perf_counter()
    result2 = fit(objective, result.params, steps=steps)
    _ = float(np.asarray(result2.losses)[-1])
    print(f"post-compile: {(time.perf_counter()-t0)/steps*1e3:.1f} ms/step",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
