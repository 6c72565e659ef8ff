"""Micro-cost of one f64 element combine at D=15/30 on the v5e.

The steady engine's hi-precision constants chain ~20-25 of these; if one
combine is ~5 ms the df64 (two-float32) rewrite (ROADMAP item 5) is worth
it. Times K chained combines and divides.
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

from temporalgps_tpu.ops import assoc


def element(D, dtype, key):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    A = 0.9 * jnp.eye(D, dtype=dtype) + 0.01 * jax.random.normal(k1, (D, D), dtype)
    C = jnp.eye(D, dtype=dtype) + 0.1 * jax.random.normal(k2, (D, D), dtype)
    C = 0.5 * (C + C.T) + D * jnp.eye(D, dtype=dtype)
    J = 0.1 * jnp.eye(D, dtype=dtype)
    return (A, jnp.zeros((D,), dtype), C, jnp.zeros((D,), dtype), J)


def main():
    print(jax.devices(), flush=True)
    K = 24
    for D in (15, 30):
        for dtype in (jnp.float32, jnp.float64):
            E = element(D, dtype, D)

            @jax.jit
            def chain(E):
                out = E
                for _ in range(K):
                    out = assoc._combine_filter(out, out)
                return out[2]

            r = chain(E); r.block_until_ready()
            # amortised: enqueue many, fetch last
            t0 = time.perf_counter()
            for _ in range(20):
                r = chain(E)
            float(r[0, 0])
            dt = (time.perf_counter() - t0) / 20 / K
            print(f"D={D} {dtype.__name__}: {dt*1e3:.3f} ms/combine", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
