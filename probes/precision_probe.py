"""TPU probe: matmul precision sweep on the big-state (D=150) exact
spatio-temporal filter.

The big-state drivers currently trace under 'highest' (6-pass true-f32)
because 'default' (single bf16 pass) NaNs the covariance recursion. This
probe measures the intermediate 'high' (bf16_3x / 3-pass) setting: if the
recursion stays finite and accurate, it reclaims ~2x of matmul throughput
on the matmul-bound spatio-temporal family.
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

import temporalgps_tpu.config as cfg

# Neutralise the drivers' internal precision_ctx so the ambient
# default_matmul_precision context set below is what actually applies.
cfg._prec_env = "probe-local"

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import EQ, GP, ArrayStorage, Matern52, to_sde
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.models import lgssm as lg
from temporalgps_tpu.space_time import RectilinearGrid, Separable


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

    for Ns, Nt in [(50, 1000), (100, 1000)]:
        r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
        x = RectilinearGrid(
            r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt)
        )
        k = Separable(EQ().stretch(0.7), Matern52())
        fx = to_sde(GP(k), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
        model = api.build_lgssm(fx)
        y_tf = jnp.asarray(rng.standard_normal((Nt, Ns)), dtype)
        y_flat = y_tf.reshape(-1)

        from temporalgps_tpu.gp.lti_sde import logpdf as gp_logpdf

        for prec in ["highest", "high", "default"]:
            with jax.default_matmul_precision(prec):
                lp = jax.jit(
                    lambda y_: lg.logpdf(model, y_, engine="sequential")
                )
                dt, cs = timed(lp, y_tf)
                print(
                    f"Ns={Ns} seq  prec={prec:8s}: {dt*1e3:8.2f} ms "
                    f"val={float(lp(y_tf)):.2f} compile {cs:.0f}s",
                    flush=True,
                )
                lpk = jax.jit(lambda y_: gp_logpdf(fx, y_, engine="kron"))
                dt, cs = timed(lpk, y_flat)
                print(
                    f"Ns={Ns} kron prec={prec:8s}: {dt*1e3:8.2f} ms "
                    f"val={float(lpk(y_flat)):.2f} compile {cs:.0f}s",
                    flush=True,
                )


if __name__ == "__main__":
    main()
