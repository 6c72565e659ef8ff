"""TPU probe: DTC/ELBO throughput with the input-space factorised element
construction (assoc.element_dense_diag) — roadmap item: the per-step Ns-dim
innovation Cholesky used to dominate the block/parallel DTC path.

Workload: Separable(EQ, Matern52) on a 50-point spatial grid, M=10 inducing
points, Nt=100k — BASELINE config #5 scale (reference:
examples/approx_space_time_learning.jl:44-48).
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
from temporalgps_tpu.space_time import RectilinearGrid, Separable, elbo


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


def timed(fn, *args, iters=10):
    """Amortised enqueue-K/fetch-once timing (see bench.py)."""
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
    rng = np.random.default_rng(0)
    M, Ns, Nt = 10, 50, 100_000
    r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
    z = jnp.asarray(np.linspace(-3, 3, M), dtype)
    x = RectilinearGrid(
        r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt)
    )
    y = jnp.asarray(rng.standard_normal(Nt * Ns), dtype)

    def elbo_fn(p, y_, engine):
        s2, sc, noise = jnp.exp(p)
        kern = s2 * Separable(EQ().stretch(sc), Matern52())
        fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
        return elbo(fx, y_, z, engine=engine)

    p0 = jnp.asarray([0.0, 0.0, -2.3], dtype)
    vals = {}
    for engine in ["block", "lti", "sequential"]:
        f = jax.jit(lambda p, y_, e=engine: elbo_fn(p, y_, e))
        dt, cs = timed(f, p0, y)
        vals[engine] = float(f(p0, y))
        print(
            f"DTC elbo Ns={Ns} M={M} Nt={Nt} [{engine}]: {dt*1e3:8.2f} ms "
            f"({Ns*Nt/dt/1e6:6.1f} Mobs/s) compile {cs:.0f}s val={vals[engine]:.1f}",
            flush=True,
        )
        if engine == "lti":
            # lti reverse-mode HLO is compile-prohibitive; forward-only.
            continue
        g = jax.jit(jax.value_and_grad(lambda p, y_, e=engine: elbo_fn(p, y_, e)))
        dt, cs = timed(g, p0, y, iters=3)
        print(
            f"DTC elbo+grad [{engine}]: {dt*1e3:8.2f} ms compile {cs:.0f}s",
            flush=True,
        )
    rel = abs(vals["block"] - vals["sequential"]) / abs(vals["sequential"])
    print(f"block-vs-seq value rel diff: {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
