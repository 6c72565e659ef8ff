"""TPU probe: the time-invariant (ops/lti.py) engine vs sequential/block on
the Fill-parameter workloads:
  1. DTC elbo + grad, Ns=50 M=10 Nt=100k (D=30)
  2. exact space-time logpdf, Ns=50 Nt=1000 (D=150)
  3. scalar Matern52 logpdf, N=1M (D=3; Pallas block path is the incumbent)
All timed functions return scalars (full-execution forcing).
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
from temporalgps_tpu.gp.lti_sde import build_lgssm
from temporalgps_tpu.space_time import RectilinearGrid, Separable, elbo
from temporalgps_tpu.space_time.pseudo_point import dtcify
from temporalgps_tpu.models import lgssm as lg


def _force(out):
    """Fetch to host: block_until_ready does not force execution on the
    tunneled backend (measured) — only a host transfer does."""
    return jax.tree.map(lambda a: np.asarray(a).ravel()[0], out)


def timed(fn, *args, iters=5):
    t0 = time.perf_counter()
    _force(fn(*args))
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        _force(fn(*args))
    return (time.perf_counter() - t0) / iters, cs


def main():
    print(jax.devices(), flush=True)
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    # --- 1. DTC Nt=100k ---------------------------------------------------
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
    for engine in ["lti", "sequential"]:
        f = jax.jit(lambda p, y_, e=engine: elbo_fn(p, y_, e))
        dt, cs = timed(f, p0, y)
        vals[engine] = float(f(p0, y))
        print(
            f"DTC elbo Nt={Nt} [{engine}]: {dt*1e3:8.2f} ms "
            f"({Ns*Nt/dt/1e6:6.1f} Mobs/s) compile {cs:.0f}s val={vals[engine]:.1f}",
            flush=True,
        )
        if engine != "lti":
            # reverse-mode through the lti pipeline produces a
            # compile-prohibitive HLO on the remote service (>85 min);
            # the block engine is the DTC gradient path.
            g = jax.jit(jax.value_and_grad(lambda p, y_, e=engine: elbo_fn(p, y_, e)))
            dt, cs = timed(g, p0, y, iters=3)
            print(f"DTC elbo+grad [{engine}]: {dt*1e3:8.2f} ms compile {cs:.0f}s", flush=True)
    rel = abs(vals["lti"] - vals["sequential"]) / abs(vals["sequential"])
    print(f"lti-vs-seq elbo rel: {rel:.2e}", flush=True)

    # --- 2. exact space-time 50x1000 (D=150) ------------------------------
    Nt2 = 1000
    x2 = RectilinearGrid(
        r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt2)
    )
    kern2 = Separable(EQ().stretch(0.7), Matern52())
    fx2 = to_sde(GP(kern2), ArrayStorage(dtype))(x2, jnp.asarray(0.1, dtype))
    model2 = build_lgssm(fx2)
    y2 = jnp.asarray(rng.standard_normal((Nt2, Ns)), dtype)
    v2 = {}
    for engine in ["lti", "sequential"]:
        f = jax.jit(lambda y_, e=engine: lg.logpdf(model2, y_, engine=e))
        dt, cs = timed(f, y2)
        v2[engine] = float(f(y2))
        print(
            f"exact 50x1000 logpdf [{engine}]: {dt*1e3:8.2f} ms "
            f"({Ns*Nt2/dt/1e6:5.2f} Mobs/s) compile {cs:.0f}s val={v2[engine]:.1f}",
            flush=True,
        )
    print(f"lti-vs-seq exact rel: {abs(v2['lti']-v2['sequential'])/abs(v2['sequential']):.2e}", flush=True)

    # --- 3. scalar N=1M ---------------------------------------------------
    N3 = 1_000_000
    x3 = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N3)
    fx3 = to_sde(GP(Matern52()), ArrayStorage(dtype))(x3, jnp.asarray(0.1, dtype))
    model3 = build_lgssm(fx3)
    y3 = jax.device_put(rng.standard_normal(N3).astype(np.float32))
    v3 = {}
    for engine in ["lti", "block"]:
        f = jax.jit(lambda y_, e=engine: lg.logpdf(model3, y_, engine=e))
        dt, cs = timed(f, y3, iters=10)
        v3[engine] = float(f(y3))
        print(
            f"scalar N=1M logpdf [{engine}]: {dt*1e3:8.2f} ms "
            f"({N3/dt/1e6:6.1f} Msteps/s) compile {cs:.0f}s val={v3[engine]:.1f}",
            flush=True,
        )
    print(f"lti-vs-block scalar rel: {abs(v3['lti']-v3['block'])/abs(v3['block']):.2e}", flush=True)


if __name__ == "__main__":
    main()
