"""TPU probe: steady-state engine (ops/steady.py).

Workloads:
  1. scalar Matern52 N=1M f32: logpdf + lp-grad (3 hyperparams), steady vs
     current best (block / fused-fwd) — and a 10-hyperparameter sum-kernel
     grad to show O(1) scaling in k.
  2. DTC elbo + grad at Nt=100k and Nt=1M, M=5/10, Ns=50 (BASELINE config
     #5 at spec scale), steady vs block cross-check at small Nt.
Amortised honest timing (see bench.py timed()).
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
from temporalgps_tpu.gp import EQ, GP, ArrayStorage, Matern32, Matern52, to_sde
from temporalgps_tpu.models import lgssm as lg
from temporalgps_tpu.gp.lti_sde import build_lgssm
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
        print(f"floor {_FLOOR*1e3:.2f} ms", flush=True)
    return _FLOOR


def timed(fn, *args, iters=20):
    fl = _floor()
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return max((time.perf_counter() - t0 - fl) / iters, 1e-9), cs


def main():
    print(jax.devices(), flush=True)
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    # --- 1. scalar N=1M ---------------------------------------------------
    N = 1_000_000
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    y = jax.device_put(rng.standard_normal(N).astype(np.float32))

    def loss_steady(p, y_, n_warmup=4096):
        s2, sc, noise = jnp.exp(p)
        kern = (s2 * Matern52()).stretch(sc)
        fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
        from temporalgps_tpu.ops import steady

        return steady.logpdf(build_lgssm(fx), y_, n_warmup=n_warmup)

    p0 = jnp.zeros(3, dtype)
    f = jax.jit(loss_steady)
    dt, cs = timed(f, p0, y)
    print(f"steady logpdf N=1M: {dt*1e3:.2f} ms ({N/dt/1e9:.2f} Gsteps/s) compile {cs:.0f}s val={float(f(p0,y)):.1f}", flush=True)

    # cross-check vs block at N=1M
    lp_blk = jax.jit(lambda y_: lg.logpdf(
        build_lgssm(to_sde(GP(Matern52()), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))), y_, engine="block"))
    lp_st0 = jax.jit(lambda y_: lg.logpdf(
        build_lgssm(to_sde(GP(Matern52()), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))), y_, engine="steady"))
    a, b = float(lp_blk(y)), float(lp_st0(y))
    print(f"cross-check N=1M: block={a:.2f} steady={b:.2f} rel={abs(a-b)/abs(a):.2e}", flush=True)

    g = jax.jit(lambda p, y_: jax.value_and_grad(loss_steady)(p, y_)[1][0])
    dt, cs = timed(g, p0, y)
    print(f"steady lp+grad(3) N=1M: {dt*1e3:.2f} ms ({N/dt/1e6:.0f} Msteps/s) compile {cs:.0f}s", flush=True)

    # 10-hyperparameter kernel: sum of 3 stretched/scaled Materns + noise
    def loss10(p, y_):
        q = jnp.exp(p)
        kern = (
            (q[0] * Matern52()).stretch(q[1])
            + (q[2] * Matern32()).stretch(q[3])
            + (q[4] * Matern52()).stretch(q[5])
            + (q[6] * Matern32()).stretch(q[7])
        )
        fx = to_sde(GP(kern), ArrayStorage(dtype))(x, q[8] + q[9])
        from temporalgps_tpu.ops import steady

        return steady.logpdf(build_lgssm(fx), y_, n_warmup=4096)

    p10 = jnp.zeros(10, dtype)
    g10 = jax.jit(lambda p, y_: jax.value_and_grad(loss10)(p, y_)[1][0])
    dt, cs = timed(g10, p10, y, iters=10)
    print(f"steady lp+grad(10, D=10) N=1M: {dt*1e3:.2f} ms compile {cs:.0f}s", flush=True)

    # --- 2. DTC ----------------------------------------------------------
    for Nt, M, iters in [(100_000, 10, 10), (1_000_000, 5, 5)]:
        Ns = 50
        r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
        z = jnp.asarray(np.linspace(-3, 3, M), dtype)
        xg = RectilinearGrid(r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt))
        yg = jnp.asarray(rng.standard_normal(Nt * Ns), dtype)

        def elbo_fn(p, y_, engine="steady"):
            s2, sc, noise = jnp.exp(p)
            kern = s2 * Separable(EQ().stretch(sc), Matern52())
            fx = to_sde(GP(kern), ArrayStorage(dtype))(xg, noise)
            return elbo(fx, y_, z, engine=engine)

        p0 = jnp.asarray([0.0, 0.0, -2.3], dtype)
        f = jax.jit(elbo_fn)
        dt, cs = timed(f, p0, yg, iters=iters)
        print(f"DTC steady elbo Nt={Nt} M={M}: {dt*1e3:.2f} ms compile {cs:.0f}s val={float(f(p0,yg)):.1f}", flush=True)
        g = jax.jit(lambda p, y_: jax.value_and_grad(elbo_fn)(p, y_)[0:2])
        dt, cs = timed(g, p0, yg, iters=iters)
        print(f"DTC steady elbo+grad Nt={Nt} M={M}: {dt*1e3:.2f} ms compile {cs:.0f}s", flush=True)
        if Nt == 100_000:
            vb = float(jax.jit(lambda p, y_: elbo_fn(p, y_, engine="block"))(p0, yg))
            vs = float(f(p0, yg))
            print(f"DTC cross-check Nt=100k: block={vb:.1f} steady={vs:.1f} rel={abs(vb-vs)/abs(vb):.2e}", flush=True)

    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
