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


_FLOOR = None


def _floor():
    global _FLOOR
    if _FLOOR is None:
        f = jax.jit(lambda x: x + 1.0)
        z = jnp.zeros(())
        float(f(z))
        t0 = time.perf_counter()
        for _ in range(10):
            float(f(z))
        _FLOOR = (time.perf_counter() - t0) / 10
        print(f"host round-trip floor: {_FLOOR*1e3:.2f} ms", flush=True)
    return _FLOOR


def timed(fn, *args, iters=30):
    """Amortised: enqueue iters, fetch the final scalar once (bench.py)."""
    fl = _floor()
    t0 = time.perf_counter()
    float(np.asarray(fn(*args)).ravel()[0])
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    float(np.asarray(fn(*args)).ravel()[0])
    return max((time.perf_counter() - t0 - fl) / iters, 1e-9), cs


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
