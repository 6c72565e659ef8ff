"""Bisect which sub-graph SIGKILLs the remote TPU compile helper.

Section A SIGKILL: scalar steady lp+grad at N=1M (D=3).
Section C SIGKILL: steady approx-posterior smoother fwd at Nt=1M (DTC D=15).
Each case below .lower().compile()s one candidate sub-graph and prints
timing; run to find the smallest killer.
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
from temporalgps_tpu.gp import GP, ArrayStorage, Matern52, to_sde
from temporalgps_tpu.gp.lti_sde import build_lgssm
from temporalgps_tpu.models import lgssm as lg
from temporalgps_tpu.ops import steady

dtype = jnp.float32
rng = np.random.default_rng(0)


def compile_case(name, fn, *args):
    t0 = time.perf_counter()
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{name}: compiled in {time.perf_counter()-t0:.0f}s", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def scalar_loss(p, y, N, **kw):
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    s2, sc, noise = jnp.exp(p)
    fx = to_sde(GP((s2 * Matern52()).stretch(sc)), ArrayStorage(dtype))(x, noise)
    return steady.logpdf(build_lgssm(fx), y, **kw)


def main():
    print(jax.devices(), flush=True)
    p0 = jnp.zeros(3, dtype)

    # 1. bare affine_const_states grad at M=1M, D=3 (the custom-VJP graph)
    G = jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32) * 0.3)
    w1m = jnp.asarray(rng.standard_normal((1_000_000, 3)).astype(np.float32))
    m0 = jnp.zeros(3, dtype)
    compile_case(
        "acs grad M=1M D=3",
        jax.grad(lambda G_, w_: jnp.sum(steady.affine_const_states(G_, w_, m0)),
                 argnums=(0, 1)),
        G, w1m,
    )

    # 2. scalar steady grad at growing N
    for N in (131072, 262144, 524288, 1_000_000):
        y = jnp.asarray(rng.standard_normal(N).astype(np.float32))
        compile_case(
            f"scalar lp+grad N={N}",
            jax.grad(lambda p, y_, N=N: scalar_loss(p, y_, N)), p0, y,
        )

    # 3. scalar steady grad N=1M with larger block_len (shallower KS)
    y1m = jnp.asarray(rng.standard_normal(1_000_000).astype(np.float32))
    for L in (64, 256):
        compile_case(
            f"scalar lp+grad N=1M L={L}",
            jax.grad(lambda p, y_, L=L: scalar_loss(p, y_, 1_000_000,
                                                    block_len=L)), p0, y1m,
        )
    smoother_cases()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()


def smoother_cases():
    """C-section SIGKILL bisect: steady approx-posterior smoother fwd."""
    from temporalgps_tpu.gp import EQ
    from temporalgps_tpu.space_time import (
        RectilinearGrid, Separable, approx_posterior_marginals,
    )
    from temporalgps_tpu.gp import to_sde as ts

    for Nt in (250_000, 500_000, 1_000_000):
        M, Ns = 5, 50
        r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
        z = jnp.asarray(np.linspace(-3, 3, M), dtype)
        x = RectilinearGrid(
            r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt)
        )
        kern = Separable(EQ().stretch(0.7), Matern52())
        fx = to_sde(GP(kern), ArrayStorage(dtype))(x, 0.1)
        x_pr = RectilinearGrid(
            jnp.asarray(np.linspace(-2, 2, 10), dtype),
            RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt),
        )
        y = jnp.asarray(rng.standard_normal(Nt * Ns).astype(np.float32))
        compile_case(
            f"steady smoother fwd Nt={Nt}",
            lambda y_: approx_posterior_marginals(fx, y_, z, x_pr,
                                                  engine="steady"), y,
        )
