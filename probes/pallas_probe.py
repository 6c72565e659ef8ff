"""TPU probe: padded XLA block engine vs Pallas fused kernels, N=1M f32."""
# NOTE: this probe predates the amortised-timing methodology (see bench.py
# timed()); its block_until_ready-based numbers under-report sub-100ms
# runs on the tunneled backend. Kept as an investigation artifact.

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tgps_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import GP, ArrayStorage, Matern52, to_sde
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.ops import block


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

    ref = None
    for name, nb, pallas in [
        ("xla+pad B=8192", 8192, False),
        ("xla+pad B=16384", 16384, False),
        ("pallas  B=8192", 8192, True),
        ("pallas  B=32768", 32768, True),
        ("pallas  B=65536", 65536, True),
    ]:
        @jax.jit
        def lp(y_):
            return block.logpdf(model, y_, n_blocks=nb, pallas=pallas)

        try:
            dt, cs = timed(lp, y)
            val = float(lp(y))
            if ref is None:
                ref = val
            print(
                f"{name}: {dt*1e3:8.2f} ms ({N/dt/1e6:7.1f} Msteps/s) "
                f"compile {cs:5.0f}s val={val:.2f} dref={val-ref:+.2e}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name} FAILED: {type(exc).__name__}: {str(exc)[:300]}", flush=True)

    # grad via custom_vjp (backward = padded XLA)
    @jax.jit
    def lpg(y_):
        def loss(p):
            s2, sc = p
            kern = (s2 * Matern52()).stretch(sc)
            m = api.build_lgssm(
                to_sde(GP(kern), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
            )
            return block.logpdf(m, y_, n_blocks=8192)

        v, g = jax.value_and_grad(loss)((jnp.asarray(1.0, dtype), jnp.asarray(1.0, dtype)))
        return v + g[0]

    dt, cs = timed(lpg, y, iters=5)
    print(f"lp+grad (pallas fwd, xla bwd, B=8192): {dt*1e3:.2f} ms ({N/dt/1e6:.1f} Msteps/s) compile {cs:.0f}s", flush=True)


if __name__ == "__main__":
    main()
