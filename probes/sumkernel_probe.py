"""TPU probe: BASELINE config #3 — sum/product/time-rescaled kernels at
state-dim ~16, N=1M scalar series. Engines: sequential / block / lti.
Kernel: Matern52 + 0.6*Matern32.stretch(0.5) + ApproxPeriodic (D=3+2+14=19
with the default 7 cosine blocks) — amortised honest timing.
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
from temporalgps_tpu.gp import (
    GP,
    ApproxPeriodic,
    ArrayStorage,
    Matern32,
    Matern52,
    to_sde,
)
from temporalgps_tpu.gp.lti_sde import build_lgssm
from temporalgps_tpu.models import lgssm as lg

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


def timed(fn, *args, iters=30):
    fl = _floor()
    t0 = time.perf_counter()
    float(fn(*args))
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    float(fn(*args))
    return max((time.perf_counter() - t0 - fl) / iters, 1e-9), cs


def main():
    print(jax.devices(), flush=True)
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    N = 1_000_000
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    kern = (
        Matern52()
        + 0.6 * Matern32().stretch(0.5)
        + 0.3 * ApproxPeriodic(0.5)
    )
    fx = to_sde(GP(kern), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    model = build_lgssm(fx)
    print(f"D={model.latent_dim}", flush=True)
    y = jax.device_put(rng.standard_normal(N).astype(np.float32))

    vals = {}
    # With the f32 process-noise floor (gp/lti_sde.broadcast_components)
    # the deterministic cosine blocks no longer drift the recursion
    # indefinite; lti still OOMs at N=1M D=19 and sqrt's batched-QR graph
    # is compile-prohibitive — measure sequential (the det-model default)
    # and block.
    for engine, iters in [("sequential", 2), ("block", 10)]:
        try:
            f = jax.jit(lambda y_, e=engine: lg.logpdf(model, y_, engine=e))
            dt, cs = timed(f, y, iters=iters)
            vals[engine] = float(f(y))
            print(
                f"sum-kernel D={model.latent_dim} N=1M logpdf [{engine}]: "
                f"{dt*1e3:8.2f} ms ({N/dt/1e6:6.1f} Msteps/s) compile {cs:.0f}s "
                f"val={vals[engine]:.1f}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — probe resilience
            print(f"[{engine}] failed: {type(e).__name__}", flush=True)
    for a, b in [("block", "sequential")]:
        if a in vals and b in vals:
            print(f"{a}-vs-{b} rel: {abs(vals[a]-vals[b])/abs(vals[b]):.2e}", flush=True)


if __name__ == "__main__":
    main()
