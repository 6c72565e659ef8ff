"""TPU probe: posterior construction + smoothing marginals at N=1M, scalar
Matern52 — the prediction workload (BASELINE config #1 / reference
examples/exact_time_inference.jl scale). Times the engines available for
the Reverse-ordered smoothing pass.
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
from temporalgps_tpu.gp import GP, ArrayStorage, Matern52, to_sde
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.models import lgssm as lg


def timed(fn, *args, iters=5):
    """Host-fetch each iteration: block_until_ready does not force
    execution on the tunneled backend (see CLAUDE.md perf notes)."""
    t0 = time.perf_counter()
    float(np.asarray(fn(*args)).ravel()[0])
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(fn(*args)).ravel()[0])
    return (time.perf_counter() - t0) / iters, cs


def main():
    print(jax.devices(), flush=True)
    dtype = jnp.float32
    N = 1_000_000
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    y = jax.device_put(
        np.random.default_rng(0).standard_normal(N).astype(np.float32)
    )
    fx = to_sde(GP(Matern52()), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    model = api.build_lgssm(fx)

    for eng in ["parallel", "block"]:
        # Return a SCALAR so timing forces full execution (block_until_ready
        # on unfetched big outputs under-reports on the tunneled backend).
        def run(y_, e=eng):
            m, v = lg.marginals_diag(lg.posterior(model, y_, engine=e), engine=e)
            return jnp.sum(m) + jnp.sum(v)

        fn = jax.jit(run)
        dt, cs = timed(fn, y)
        mv = jax.jit(
            lambda y_, e=eng: lg.marginals_diag(
                lg.posterior(model, y_, engine=e), engine=e
            )
        )(y)
        print(
            f"posterior+marginals_diag[{eng}]: {dt*1e3:8.2f} ms "
            f"({N/dt/1e6:6.1f} Msteps/s) compile {cs:.0f}s "
            f"m0={float(mv[0][0]):.4f} vN={float(mv[1][-1]):.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
