"""TPU probe round 2: steady engine gradients + DTC at spec scale.

Sections (each isolated; prints flush as they land):
  A. scalar Matern52 N=1M f32: steady lp+grad(3) and lp+grad(10) — the
     reverse-mode cost is O(1) in hyperparameter count (no (N,D,D)
     residuals); previously SIGKILLed the remote compile helper, retry.
  B. DTC (Ns=50, M=10) Nt=100k: steady elbo fwd + grad vs the block
     engine's 545 ms / 5.24 s (docs/ROADMAP.md item 2).
  C. DTC Nt=1M, M=5: steady elbo fwd + grad (BASELINE config #5 at spec
     scale — target < 5 s/step) + steady posterior marginals
     (approx_posterior_marginals engine="steady").
Amortised honest timing (see bench.py timed()).
"""

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tgps_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import EQ, GP, ArrayStorage, Matern32, Matern52, to_sde
from temporalgps_tpu.gp.lti_sde import build_lgssm
from temporalgps_tpu.models import lgssm as lg
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


def section(name):
    def deco(fn):
        def run():
            print(f"== {name} ==", flush=True)
            try:
                fn()
            except Exception:
                print(f"{name} FAILED:", flush=True)
                traceback.print_exc()
                sys.stdout.flush()
        return run
    return deco


dtype = jnp.float32
rng = np.random.default_rng(0)
N = 1_000_000
x1m = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
y1m = None


@section("A: scalar steady grads N=1M")
def sec_a():
    global y1m
    y1m = jax.device_put(rng.standard_normal(N).astype(np.float32))

    def loss3(p, y_):
        s2, sc, noise = jnp.exp(p)
        fx = to_sde(GP((s2 * Matern52()).stretch(sc)), ArrayStorage(dtype))(
            x1m, noise
        )
        return lg.logpdf(build_lgssm(fx), y_, engine="steady")

    p0 = jnp.zeros(3, dtype)
    f = jax.jit(loss3)
    dt, cs = timed(f, p0, y1m)
    print(f"steady logpdf N=1M: {dt*1e3:.2f} ms compile {cs:.0f}s "
          f"val={float(f(p0, y1m)):.1f}", flush=True)

    g = jax.jit(lambda p, y_: jax.value_and_grad(loss3)(p, y_)[1][0])
    dt, cs = timed(g, p0, y1m)
    print(f"steady lp+grad(3) N=1M: {dt*1e3:.2f} ms "
          f"({N/dt/1e6:.0f} Msteps/s) compile {cs:.0f}s", flush=True)

    def loss10(p, y_):
        q = jnp.exp(p)
        kern = (
            (q[0] * Matern52()).stretch(q[1])
            + (q[2] * Matern32()).stretch(q[3])
            + (q[4] * Matern52()).stretch(q[5])
            + (q[6] * Matern32()).stretch(q[7])
        )
        fx = to_sde(GP(kern), ArrayStorage(dtype))(x1m, q[8] + q[9])
        return lg.logpdf(build_lgssm(fx), y_, engine="steady")

    p10 = jnp.zeros(10, dtype)
    g10 = jax.jit(lambda p, y_: jax.value_and_grad(loss10)(p, y_)[1][0])
    dt, cs = timed(g10, p10, y1m, iters=10)
    print(f"steady lp+grad(10, D=10) N=1M: {dt*1e3:.2f} ms compile {cs:.0f}s",
          flush=True)


def _dtc_setup(Nt, M, Ns=50):
    r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
    z = jnp.asarray(np.linspace(-3, 3, M), dtype)
    x = RectilinearGrid(
        r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt)
    )
    y = jnp.asarray(rng.standard_normal(Nt * Ns).astype(np.float32))

    def elbo_fn(p, y_, engine):
        s2, sc, noise = jnp.exp(p)
        kern = s2 * Separable(EQ().stretch(sc), Matern52())
        fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
        return elbo(fx, y_, z, engine=engine)

    return x, z, y, elbo_fn


@section("B: DTC Nt=100k steady elbo")
def sec_b():
    Nt, M = 100_000, 10
    x, z, y, elbo_fn = _dtc_setup(Nt, M)
    p0 = jnp.asarray([0.0, 0.0, -2.3], dtype)
    f = jax.jit(lambda p, y_: elbo_fn(p, y_, "steady"))
    dt, cs = timed(f, p0, y, iters=10)
    print(f"B elbo fwd Nt=100k M=10: {dt*1e3:.2f} ms compile {cs:.0f}s "
          f"val={float(f(p0, y)):.1f}", flush=True)
    fb = jax.jit(lambda p, y_: elbo_fn(p, y_, "block"))
    vb = float(fb(p0, y))
    vs = float(f(p0, y))
    print(f"B cross-check block={vb:.2f} steady={vs:.2f} "
          f"rel={abs(vb-vs)/abs(vb):.2e}", flush=True)
    g = jax.jit(jax.value_and_grad(lambda p, y_: elbo_fn(p, y_, "steady")))
    dt, cs = timed(g, p0, y, iters=5)
    print(f"B elbo+grad Nt=100k M=10: {dt*1e3:.2f} ms compile {cs:.0f}s",
          flush=True)
    gv = g(p0, y)[1]
    gb = jax.jit(jax.value_and_grad(lambda p, y_: elbo_fn(p, y_, "block")))(
        p0, y
    )[1]
    rel = float(jnp.max(jnp.abs(gv - gb) / (jnp.abs(gb) + 1e-8)))
    print(f"B grad cross-check rel={rel:.2e}", flush=True)


@section("C: DTC Nt=1M steady elbo + posterior")
def sec_c():
    Nt, M, Ns = 1_000_000, 5, 50
    x, z, y, elbo_fn = _dtc_setup(Nt, M, Ns)
    p0 = jnp.asarray([0.0, 0.0, -2.3], dtype)
    f = jax.jit(lambda p, y_: elbo_fn(p, y_, "steady"))
    dt, cs = timed(f, p0, y, iters=5)
    print(f"C elbo fwd Nt=1M M=5: {dt*1e3:.2f} ms compile {cs:.0f}s "
          f"val={float(f(p0, y)):.1f}", flush=True)
    g = jax.jit(jax.value_and_grad(lambda p, y_: elbo_fn(p, y_, "steady")))
    dt, cs = timed(g, p0, y, iters=3)
    print(f"C elbo+grad Nt=1M M=5: {dt*1e3:.2f} ms compile {cs:.0f}s",
          flush=True)

    from temporalgps_tpu.space_time import approx_posterior_marginals
    from temporalgps_tpu.gp import to_sde as _ts

    kern = Separable(EQ().stretch(0.7), Matern52())
    fx = to_sde(GP(kern), ArrayStorage(dtype))(x, 0.1)
    x_pr = RectilinearGrid(
        jnp.asarray(np.linspace(-2, 2, 10), dtype),
        RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt),
    )
    ap = jax.jit(
        lambda y_: approx_posterior_marginals(fx, y_, z, x_pr, engine="steady")
    )
    dt, cs = timed(ap, y, iters=5)
    print(f"C approx_posterior_marginals Nt=1M: {dt*1e3:.2f} ms "
          f"compile {cs:.0f}s", flush=True)


def main():
    print(jax.devices(), flush=True)
    sec_a()
    sec_b()
    sec_c()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
