"""Roofline audit of the headline Pallas block logpdf (VERDICT r3 item 8).

The N=1M logpdf at ~0.33 ms reads 4 MB of y -> ~12 GB/s effective vs the
~190 GB/s jnp.sum yardstick (CLAUDE.md: sum of 360 MB ~ 1.9 ms) — what
bounds it? Strategy: amortised-honest timing of
  (a) jnp.sum over the same bytes (pure HBM-read yardstick),
  (b) full Pallas logpdf,
  (c) the same at N = 1M..16M -> slope = per-byte cost, intercept = the
      N-independent overhead (kernel launches + phase-2 Kogge-Stone depth
      + constant chain),
  (d) n_blocks sweep at N=16M (grid underuse vs VMEM cap).

Run backgrounded on TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH nohup python probes/roofline_probe.py \
      > /tmp/roofline.log 2>&1 &
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
from temporalgps_tpu.gp import GP, ArrayStorage, Matern52, to_sde
from temporalgps_tpu.gp import lti_sde as api

_RT = None


def _floor():
    global _RT
    if _RT is None:
        f = jax.jit(lambda x: x + 1.0)
        z = jnp.zeros(())
        float(f(z))
        t0 = time.perf_counter()
        for _ in range(10):
            float(f(z))
        _RT = (time.perf_counter() - t0) / 10
    return _RT


def timed(fn, *args, iters=50):
    """Amortised honest timing (see bench.py timed)."""
    floor = _floor()
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = max((time.perf_counter() - t0 - floor) / iters, 1e-9)
    return dt, cs


def main():
    print(jax.devices(), flush=True)
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    # (a) HBM-read yardstick at several sizes
    for nm in [4, 16, 64, 256]:
        a = jax.device_put(rng.standard_normal(nm * 250_000).astype(np.float32))
        f = jax.jit(jnp.sum)
        dt, _ = timed(f, a, iters=30)
        gbs = nm / 1e3 / dt
        print(f"sum {nm:4d} MB: {dt*1e3:7.3f} ms  ({gbs:6.1f} GB/s)", flush=True)

    # (b)+(c) logpdf N-sweep
    rows = []
    for N in [1_000_000, 2_000_000, 4_000_000, 8_000_000, 16_000_000]:
        x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
        fx = to_sde(GP(Matern52()), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
        y = jax.device_put(rng.standard_normal(N).astype(np.float32))
        f = jax.jit(lambda y_, fx_=fx: api.logpdf(fx_, y_, engine="block"))
        dt, cs = timed(f, y, iters=50)
        rows.append((N, dt))
        gbs = 4 * N / 1e9 / dt
        print(
            f"logpdf N={N/1e6:4.0f}M: {dt*1e3:7.3f} ms "
            f"({N/dt/1e9:5.2f} Gsteps/s, y-read {gbs:6.1f} GB/s) compile {cs:.0f}s",
            flush=True,
        )
    # least-squares slope/intercept
    Ns = np.array([r[0] for r in rows], np.float64)
    ts = np.array([r[1] for r in rows], np.float64)
    A = np.stack([Ns, np.ones_like(Ns)], axis=1)
    (slope, intercept), *_ = np.linalg.lstsq(A, ts, rcond=None)
    print(
        f"fit: {slope*1e9:.3f} ns/step ({4/slope/1e9:.0f} GB/s marginal), "
        f"intercept {intercept*1e3:.3f} ms",
        flush=True,
    )

    # (d) n_blocks sweep at N=16M
    N = 16_000_000
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    fx = to_sde(GP(Matern52()), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    y = jax.device_put(rng.standard_normal(N).astype(np.float32))
    for B in [512, 1024, 2048]:
        f = jax.jit(
            lambda y_, B_=B: api.logpdf(fx, y_, engine="block", n_blocks=B_)
        )
        try:
            dt, cs = timed(f, y, iters=30)
            print(
                f"logpdf N=16M B={B:5d}: {dt*1e3:7.3f} ms "
                f"({4*N/1e9/dt:6.1f} GB/s) compile {cs:.0f}s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"B={B} failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
