"""TPU benchmark: spatio-temporal workloads (BASELINE.md configs #4 and #5).

#4 exact: Separable(EQ, Matern52) on a 50-space x 1000-time grid
   (reference: examples/exact_space_time_inference.jl:28-32).
#5 approx: DTC with M inducing points, ELBO + gradient, large Nt
   (reference: examples/approx_space_time_learning.jl).
"""
# NOTE: this probe predates the amortised-timing methodology (see bench.py
# timed()); its block_until_ready-based numbers under-report sub-100ms
# runs on the tunneled backend. Kept as an investigation artifact.

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
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.models import lgssm as lg
from temporalgps_tpu.models import missings as miss
from temporalgps_tpu.space_time import RectilinearGrid, Separable, dtcify
from temporalgps_tpu.space_time.pseudo_point import kernel_diagonals


def timed(fn, *args, iters=5):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, cs


def main():
    print(jax.devices(), flush=True)
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    # --- config #4: exact grid, Ns=50, Nt=1000 (state dim 150) -----------
    Ns, Nt = 50, 1000
    r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
    x = RectilinearGrid(r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt))
    k = Separable(EQ().stretch(0.7), Matern52())
    fx = to_sde(GP(k), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    model = api.build_lgssm(fx)
    y_tf = jnp.asarray(rng.standard_normal((Nt, Ns)), dtype)

    for engine in ["parallel", "sequential", "block"]:
        lp = jax.jit(lambda y_, e=engine: lg.logpdf(model, y_, engine=e))
        dt, cs = timed(lp, y_tf)
        print(
            f"exact 50x1000 (D=150) logpdf[{engine}]: {dt*1e3:8.2f} ms "
            f"({Ns*Nt/dt/1e6:6.2f} Mobs/s) compile {cs:.0f}s val={float(lp(y_tf)):.1f}",
            flush=True,
        )

    # factored Kronecker engine (space_time/kron.py), flat-form y
    from temporalgps_tpu.gp.lti_sde import logpdf as gp_logpdf

    y_flat = y_tf.reshape(-1)
    lpk = jax.jit(lambda y_: gp_logpdf(fx, y_, engine="kron"))
    dt, cs = timed(lpk, y_flat)
    print(
        f"exact 50x1000 (D=150) logpdf[kron]: {dt*1e3:8.2f} ms "
        f"({Ns*Nt/dt/1e6:5.2f} Mobs/s) compile {cs:.0f}s val={float(lpk(y_flat)):.1f}",
        flush=True,
    )


    # --- config #5: DTC/ELBO, M=10 inducing, large Nt ---------------------
    for Nt5 in [10_000, 100_000]:
        M = 10
        Ns5 = 50
        r5 = jnp.asarray(np.linspace(-3, 3, Ns5), dtype)
        z = jnp.asarray(np.linspace(-3, 3, M), dtype)
        x5 = RectilinearGrid(
            r5, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt5)
        )
        y5 = jnp.asarray(rng.standard_normal(Nt5 * Ns5), dtype)

        def elbo_fn(p, y_):
            s2, sc, noise = jnp.exp(p)
            kern = s2 * Separable(EQ().stretch(sc), Matern52())
            fx5 = to_sde(GP(kern), ArrayStorage(dtype))(x5, noise)
            from temporalgps_tpu.space_time import elbo

            return elbo(fx5, y_, z, engine="parallel")

        p0 = jnp.asarray([0.0, 0.0, -2.3], dtype)
        f = jax.jit(elbo_fn)
        dt, cs = timed(f, p0, y5)
        print(
            f"DTC elbo Ns={Ns5} M={M} Nt={Nt5}: {dt*1e3:8.2f} ms "
            f"({Ns5*Nt5/dt/1e6:6.1f} Mobs/s) compile {cs:.0f}s val={float(f(p0, y5)):.1f}",
            flush=True,
        )
        g = jax.jit(jax.value_and_grad(elbo_fn))
        dt, cs = timed(g, p0, y5, iters=3)
        print(
            f"DTC elbo+grad Ns={Ns5} M={M} Nt={Nt5}: {dt*1e3:8.2f} ms compile {cs:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
