"""Benchmark entry point (driver-run, real TPU).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Workload: logpdf + hyperparameter gradient of a Matern-5/2 state-space GP
over N=1M regularly-spaced steps (BASELINE.md config #2,
reference: examples/exact_time_learning.jl), float32 storage, block-parallel
engine. `vs_baseline` is the speedup of the parallel engine over the
sequential-scan engine (per-step, measured at N=20k) — the "assoc-scan vs
seq speedup" driver metric from BASELINE.json. The reference publishes no
numbers (BASELINE.md), so the sequential engine is the baseline stand-in.

All diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tgps_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_RT_FLOOR = None  # host round-trip floor, measured once


def _roundtrip_floor():
    global _RT_FLOOR
    if _RT_FLOOR is None:
        import jax.numpy as _jnp

        f = jax.jit(lambda x: x + 1.0)
        z = jnp.zeros(())
        float(f(z))
        t0 = time.perf_counter()
        for _ in range(10):
            float(f(z))
        _RT_FLOOR = (time.perf_counter() - t0) / 10
        log(f"host round-trip floor: {_RT_FLOOR*1e3:.2f} ms")
    return _RT_FLOOR


def timed(fn, *args, iters=50):
    """Amortised device timing for the tunneled axon backend:
    block_until_ready does not force execution (see CLAUDE.md), and a
    per-iteration host fetch costs a ~27 ms round trip — so enqueue `iters`
    executions (FIFO on device) and fetch ONLY the final scalar; per-iter
    time is (elapsed - one round-trip floor) / iters."""
    floor = _roundtrip_floor()
    t0 = time.perf_counter()
    out = fn(*args)
    float(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    out = fn(*args)
    float(out)
    dt = max((time.perf_counter() - t0 - floor) / iters, 1e-9)
    return dt, compile_s, out


def main():
    from temporalgps_tpu import RegularSpacing
    from temporalgps_tpu.gp import GP, ArrayStorage, Matern52, to_sde
    from temporalgps_tpu.gp.lti_sde import build_lgssm
    from temporalgps_tpu.models import lgssm as lg

    log("devices:", jax.devices())
    dtype = jnp.float32
    N = 1_000_000
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    y = jax.device_put(
        np.random.default_rng(0).standard_normal(N).astype(np.float32)
    )

    def make_loss(x_, engine):
        def loss(params, y_):
            s2, sc, noise = jnp.exp(params)
            kern = (s2 * Matern52()).stretch(sc)
            fx = to_sde(GP(kern), ArrayStorage(dtype))(x_, noise)
            return lg.logpdf(build_lgssm(fx), y_, engine=engine)

        return loss

    p0 = jnp.zeros(3, dtype)

    # Headline: logpdf + full hyperparameter gradient — fused forward-mode
    # Pallas pipeline (primal + 3 tangent recursions in one pass through the
    # phase kernels, ops/block.logpdf_fwd_grad).
    from temporalgps_tpu.learning import value_and_grad_fwd_lgssm

    def model_fn(p):
        s2, sc, noise = jnp.exp(p)
        kern = (s2 * Matern52()).stretch(sc)
        fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
        return build_lgssm(fx)

    grad_block = jax.jit(
        lambda p, y_: value_and_grad_fwd_lgssm(model_fn, y_)(p)[1][0]
    )
    dt_block, cs, _ = timed(grad_block, p0, y, iters=50)
    steps_per_sec = N / dt_block
    log(f"block lp+grad(fwd) N={N}: {dt_block*1e3:.2f} ms ({steps_per_sec/1e6:.2f} Msteps/s), compile {cs:.0f}s")

    # Forward-only throughput (Pallas fused kernels).
    lp_fast = jax.jit(lambda y_: lg.logpdf(
        build_lgssm(to_sde(GP(Matern52()), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))),
        y_, engine="block",
    ))
    dt_f, cs_f, _ = timed(lp_fast, y, iters=100)
    log(f"block logpdf N={N}: {dt_f*1e3:.2f} ms ({N/dt_f/1e6:.1f} Msteps/s), compile {cs_f:.0f}s")

    # Baseline stand-in: sequential engine per-step rate at N=20k.
    N_seq = 20_000
    x_s = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N_seq)
    y_s = y[:N_seq]
    grad_seq = jax.jit(
        lambda p, y_: jax.value_and_grad(make_loss(x_s, "sequential"))(p, y_)[1][0]
    )
    dt_seq, cs_seq, _ = timed(grad_seq, p0, y_s, iters=3)
    seq_steps_per_sec = N_seq / dt_seq
    log(f"seq lp+grad N={N_seq}: {dt_seq*1e3:.2f} ms ({seq_steps_per_sec/1e6:.3f} Msteps/s), compile {cs_seq:.0f}s")

    # Correctness cross-check at N=20k.
    lp_b = float(jax.jit(make_loss(x_s, "block"))(p0, y_s))
    lp_s = float(jax.jit(make_loss(x_s, "sequential"))(p0, y_s))
    rel = abs(lp_b - lp_s) / abs(lp_s)
    log(f"cross-check: block={lp_b:.2f} seq={lp_s:.2f} rel={rel:.2e}")
    # f32 accumulation order differs between engines; f64 equivalence is
    # tested to 1e-9 in tests/. 1e-3 relative on a 20k-step f32 lml sum.
    assert rel < 1e-3, "engine mismatch"

    # Gradient cross-check: fused fwd-mode Pallas vs reverse-mode sequential.
    def model_fn_s(p):
        s2, sc, noise = jnp.exp(p)
        kern = (s2 * Matern52()).stretch(sc)
        return build_lgssm(to_sde(GP(kern), ArrayStorage(dtype))(x_s, noise))

    g_f = float(jax.jit(lambda p: value_and_grad_fwd_lgssm(model_fn_s, y_s)(p)[1][0])(p0))
    g_s = float(grad_seq(p0, y_s))
    grel = abs(g_f - g_s) / max(abs(g_s), 1e-12)
    log(f"grad cross-check: fused={g_f:.4f} seq={g_s:.4f} rel={grel:.2e}")
    assert grel < 1e-2, "gradient mismatch"

    print(
        json.dumps(
            {
                "metric": "matern52_logpdf_grad_timesteps_per_sec_N1e6_f32",
                "value": round(steps_per_sec, 1),
                "unit": "timesteps/s",
                "vs_baseline": round(steps_per_sec / seq_steps_per_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
