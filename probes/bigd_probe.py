"""TPU probe: exact spatio-temporal logpdf at the reference's own bench
shape — N_space=247, Nt in {25, 100, 1000} (reference: bench/lgssm.jl:69-160
uses N_space up to 247).

Measures sequential vs block (default covariance-form phase2) vs block
phase2="sqrt" at D = 3 * 247 = 741, f32, checking finiteness (the VERDICT
flagged the covariance-form combine NaN at big D) and agreement.
Amortised honest timing.
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
from temporalgps_tpu.gp import EQ, GP, ArrayStorage, Matern52, to_sde
from temporalgps_tpu.models import lgssm as lg
from temporalgps_tpu.gp.lti_sde import build_lgssm
from temporalgps_tpu.space_time import RectilinearGrid, Separable, dtcify
from temporalgps_tpu.space_time import grids

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
        print(f"floor {_FLOOR*1e3:.2f} ms", flush=True)
    return _FLOOR


def timed(fn, *args, iters=10):
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
    return max((time.perf_counter() - t0 - fl) / iters, 1e-9), cs


def main():
    print(jax.devices(), flush=True)
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    Ns = 247
    r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)

    for Nt in (25, 100, 1000):
        x = RectilinearGrid(
            r,
            RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.05, dtype), Nt),
        )
        kern = Separable(EQ().stretch(0.7), Matern52())
        fx = to_sde(GP(kern), ArrayStorage(dtype))(x, 0.1)
        model = build_lgssm(fx)
        y = jnp.asarray(rng.standard_normal((Nt, Ns)).astype(np.float32))
        print(f"--- Nt={Nt} D={model.latent_dim} ---", flush=True)

        vals = {}
        for name, kw in [
            ("sequential", dict(engine="sequential")),
            ("block", dict(engine="block")),
            ("block-sqrt", dict(engine="block", phase2="sqrt")),
        ]:
            try:
                f = jax.jit(lambda y_, kw=kw: lg.logpdf(model, y_, **kw))
                dt, cs = timed(f, y, iters=5 if Nt >= 1000 else 10)
                v = float(f(y))
                vals[name] = v
                finite = "finite" if np.isfinite(v) else "NOT FINITE"
                print(
                    f"{name}: {dt*1e3:.2f} ms compile {cs:.0f}s "
                    f"val={v:.2f} ({finite})",
                    flush=True,
                )
            except Exception:
                print(f"{name} FAILED:", flush=True)
                traceback.print_exc()
                sys.stdout.flush()
        if "sequential" in vals:
            for k, v in vals.items():
                if k != "sequential":
                    rel = abs(v - vals["sequential"]) / abs(vals["sequential"])
                    print(f"  rel({k} vs sequential) = {rel:.2e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
