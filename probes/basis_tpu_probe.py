"""TPU timing: basis engine at the bench-c3 shape (D_full=19 -> reduced
D=5 stochastic + 14 basis columns), N=1M f32.

Measures logpdf and fwd-mode lp+grad (3 hyperparams), cross-checks the
value against the full-model sequential engine at N=20k and the gradient
against f64 sequential autodiff at N=4k (CPU numbers say they are exact;
this checks the f32 TPU pipeline).

Run: PYTHONPATH=/root/repo:$PYTHONPATH nohup python probes/basis_tpu_probe.py > /tmp/basis_tpu.log 2>&1 &
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tgps_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import (GP, ApproxPeriodic, ArrayStorage, Matern32,
                                Matern52, to_sde)
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.learning import value_and_grad_fwd

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
        print(f"floor {_RT*1e3:.2f} ms", flush=True)
    return _RT


def timed(name, fn, *args, iters=20):
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
    dt = max((time.perf_counter() - t0 - fl) / iters, 1e-9)
    print(f"{name}: {dt*1e3:.2f} ms (compile {cs:.0f}s)", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    dtype = jnp.float32
    N = 1_000_000
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    y = jax.device_put(
        np.random.default_rng(0).standard_normal(N).astype(np.float32)
    )

    def loss(p, x_, y_, engine, **kw):
        s2, sc, noise = jnp.exp(p)
        kern = (
            s2 * Matern52()
            + 0.6 * Matern32().stretch(sc)
            + 0.3 * ApproxPeriodic(0.5)
        )
        fx = to_sde(GP(kern), ArrayStorage(dtype))(x_, noise)
        return api.logpdf(fx, y_, engine=engine, **kw)

    p0 = jnp.zeros(3, dtype)

    f_lp = jax.jit(lambda y_: loss(p0, x, y_, "basis"))
    dt_lp = timed("basis logpdf N=1M", f_lp, y, iters=20)
    print(f"  -> {N/dt_lp/1e6:.1f} Msteps/s", flush=True)

    f_vg = jax.jit(lambda p, y_: value_and_grad_fwd(
        lambda q: loss(q, x, y_, "basis"))(p))
    t0 = time.perf_counter()
    v, g = f_vg(p0, y)
    print(f"lp+grad value={float(v):.2f} grad={np.asarray(g)} "
          f"(compile {time.perf_counter()-t0:.0f}s)", flush=True)
    dt_vg = timed("basis lp+grad(fwd,k=3) N=1M", f_vg, p0, y, iters=20)
    print(f"  -> {N/dt_vg/1e6:.1f} Msteps/s", flush=True)

    # value cross-check vs full-model sequential at 20k
    N2 = 20_000
    x2 = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N2)
    y2 = y[:N2]
    v_b = float(jax.jit(lambda y_: loss(p0, x2, y_, "basis"))(y2))
    v_s = float(jax.jit(lambda y_: loss(p0, x2, y_, "sequential"))(y2))
    print(f"value cross-check 20k: basis={v_b:.2f} seq={v_s:.2f} "
          f"rel={abs(v_b-v_s)/abs(v_s):.2e}", flush=True)

    # grad cross-check at 4k (f32 TPU vs f32 TPU sequential autodiff)
    N3 = 4_096
    x3 = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N3)
    y3 = y[:N3]
    _, g_b = jax.jit(lambda p: value_and_grad_fwd(
        lambda q: loss(q, x3, y3, "basis"))(p))(p0)
    _, g_s = jax.jit(lambda p: jax.value_and_grad(
        lambda q: loss(q, x3, y3, "sequential"))(p))(p0)
    rel = float(jnp.max(jnp.abs(g_b - g_s) / (jnp.abs(g_s) + 1e-6)))
    print(f"grad cross-check 4k: basis={np.asarray(g_b)} "
          f"seq={np.asarray(g_s)} rel={rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
