"""Quick TPU perf probe: Matern52 logpdf (+grad) across engines/dtypes.

Run on the real chip:  PYTHONPATH=/root/repo:$PYTHONPATH python probes/perf_probe.py
"""
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


def bench(fn, *args, iters=3):
    t0 = time.perf_counter()
    fn(*args).block_until_ready()  # compile
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters, compile_s, out


def run(dtype_name, dtype, N, engine, do_grad=True):
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    f = to_sde(GP(Matern52()), ArrayStorage(dtype))
    fx = f(x, jnp.asarray(0.1, dtype))
    y = jax.device_put(
        np.random.default_rng(0).standard_normal(N).astype(np.dtype(dtype))
    )
    model = api.build_lgssm(fx)

    @jax.jit
    def lp(y):
        return lg.logpdf(model, y, engine=engine)

    dt, cs, val = bench(lp, y)
    print(
        f"{dtype_name} N={N:>9} {engine:10s} logpdf : {dt*1e3:9.2f} ms "
        f"({N/dt/1e6:8.1f} Msteps/s) compile {cs:5.1f}s val={float(val):.2f}",
        flush=True,
    )
    if not do_grad:
        return

    @jax.jit
    def lp_grad(y, p):
        def loss(params):
            s2, sc = params
            kern = (s2 * Matern52()).stretch(sc)
            m = api.build_lgssm(
                to_sde(GP(kern), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
            )
            return lg.logpdf(m, y, engine=engine)

        v, g = jax.value_and_grad(loss)(p)
        return v + g[0] + g[1]

    p = (jnp.asarray(1.0, dtype), jnp.asarray(1.0, dtype))
    dt, cs, _ = bench(lp_grad, y, p)
    print(
        f"{dtype_name} N={N:>9} {engine:10s} lp+grad: {dt*1e3:9.2f} ms "
        f"({N/dt/1e6:8.1f} Msteps/s) compile {cs:5.1f}s",
        flush=True,
    )


def main():
    print("devices:", jax.devices(), flush=True)
    cases = []
    for arg in sys.argv[1:]:
        dtype_name, N, engine = arg.split(":")
        cases.append((dtype_name, int(N), engine))
    if not cases:
        cases = [
            ("f32", 1_000_000, "block"),
            ("f64", 1_000_000, "block"),
            ("f32", 1_000_000, "parallel"),
            ("f32", 100_000, "sequential"),
        ]
    for dtype_name, N, engine in cases:
        dtype = jnp.float64 if dtype_name == "f64" else jnp.float32
        try:
            run(dtype_name, dtype, N, engine)
        except Exception as exc:  # noqa: BLE001
            print(f"{dtype_name} N={N} {engine} FAILED: {exc}", flush=True)


if __name__ == "__main__":
    main()
