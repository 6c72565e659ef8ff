"""Sweep block counts for the block engine on TPU: total scan iterations
~ 2*N/B + log2(B); per-iteration dispatch overhead dominates, so larger B
(shorter within-block scans) should win until phase-2 costs take over."""
# NOTE: this probe predates the amortised-timing methodology (see bench.py
# timed()); its block_until_ready-based numbers under-report sub-100ms
# runs on the tunneled backend. Kept as an investigation artifact.

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import GP, ArrayStorage, Matern52, to_sde
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.models import lgssm as lg

jax.config.update("jax_compilation_cache_dir", "/tmp/tgps_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def timed(fn, *args, iters=10):
    t0 = time.perf_counter()
    fn(*args).block_until_ready()
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters, cs


def main():
    print(jax.devices(), flush=True)
    dtype = jnp.float32
    N = 1_000_000
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    fx = to_sde(GP(Matern52()), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    model = api.build_lgssm(fx)
    y = jax.device_put(np.random.default_rng(0).standard_normal(N).astype(np.float32))

    from temporalgps_tpu.ops import block

    for nb in [8192, 32768, 65536, 131072]:
        @jax.jit
        def lp(y_):
            return block.logpdf(model, y_, n_blocks=nb)

        dt, cs = timed(lp, y)
        print(
            f"n_blocks={nb:>7}: logpdf {dt*1e3:8.2f} ms ({N/dt/1e6:7.1f} Msteps/s), compile {cs:.0f}s",
            flush=True,
        )

        @jax.jit
        def lpg(y_):
            def loss(p):
                s2, sc = p
                kern = (s2 * Matern52()).stretch(sc)
                m = api.build_lgssm(
                    to_sde(GP(kern), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
                )
                return block.logpdf(m, y_, n_blocks=nb)

            v, g = jax.value_and_grad(loss)((jnp.asarray(1.0, dtype), jnp.asarray(1.0, dtype)))
            return v + g[0]

        dt, cs = timed(lpg, y, iters=5)
        print(
            f"n_blocks={nb:>7}: lp+grad {dt*1e3:8.2f} ms ({N/dt/1e6:7.1f} Msteps/s), compile {cs:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
