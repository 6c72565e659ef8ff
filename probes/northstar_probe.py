"""TPU probe: the BASELINE.json north star — logpdf+grad, Matern52, N=10M
(target < 100 ms on one chip), via the fused forward-mode Pallas pipeline.
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
from temporalgps_tpu.gp.lti_sde import build_lgssm
from temporalgps_tpu.learning import value_and_grad_fwd_lgssm
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
    """Amortised: enqueue iters, fetch final scalar once (see bench.py)."""
    fl = _floor()
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree.map(lambda a: float(jnp.ravel(a)[0]), out)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    out = fn(*args)
    jax.tree.map(lambda a: float(jnp.ravel(a)[0]), out)
    return max((time.perf_counter() - t0 - fl) / iters, 1e-9), cs


def main():
    print(jax.devices(), flush=True)
    dtype = jnp.float32
    for N in [10_000_000]:
        x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.0001, dtype), N)
        y = jax.device_put(
            np.random.default_rng(0).standard_normal(N).astype(np.float32)
        )

        def model_fn(p):
            s2, sc, noise = jnp.exp(p)
            kern = (s2 * Matern52()).stretch(sc)
            return build_lgssm(to_sde(GP(kern), ArrayStorage(dtype))(x, noise))

        p0 = jnp.zeros(3, dtype)
        vg = jax.jit(lambda p, y_: value_and_grad_fwd_lgssm(model_fn, y_)(p))
        dt, cs = timed(vg, p0, y)
        v, g = vg(p0, y)
        print(
            f"N={N}: lp+grad(fused fwd) {dt*1e3:.2f} ms "
            f"({N/dt/1e6:.1f} Msteps/s) compile {cs:.0f}s "
            f"val={float(v):.1f} g0={float(g[0]):.3f}",
            flush=True,
        )

        lp = jax.jit(lambda y_: lg.logpdf(model_fn(p0), y_, engine="block"))
        dt, cs = timed(lp, y)
        print(
            f"N={N}: logpdf {dt*1e3:.2f} ms ({N/dt/1e6:.1f} Msteps/s) "
            f"compile {cs:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
