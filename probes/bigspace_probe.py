"""Reference bench shape: exact spatio-temporal logpdf at N_space=247.

/root/reference/bench/lgssm.jl:69-160 benches the materialised LGSSM at
N_space=247 (RRegression posterior shape), Nt 25-100. Our engines:
sequential (materialised D=741 recursion), kron (factored component-major),
block with phase2="sqrt" (QR-form elements past the f32 covariance cliff).
VERDICT round-1 weak #3: this shape was never measured; block big-D NaNs in
covariance form at default settings.
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
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.models import lgssm as lg
from temporalgps_tpu.space_time import RectilinearGrid, Separable, grids

dtype = jnp.float32
rng = np.random.default_rng(0)

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
    v = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return max((time.perf_counter() - t0 - fl) / iters, 1e-9), cs, v


def main():
    print(jax.devices(), flush=True)
    Ns = 247
    for Nt in (25, 100):
        r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
        x = RectilinearGrid(
            r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.05, dtype), Nt)
        )
        kern = Separable(EQ().stretch(0.7), Matern52())
        fx = to_sde(GP(kern), ArrayStorage(dtype))(x, 0.1)
        y = jnp.asarray(rng.standard_normal(Ns * Nt).astype(np.float32))
        model = api.build_lgssm(fx)
        y_tf = grids.observations_to_time_form(fx.x, y)
        for engine, kw in (
            ("sequential", {}),
            ("kron", {}),
            ("block", {}),
            ("block", {"phase2": "sqrt"}),
            ("steady", {}),
        ):
            label = engine + ("+sqrt" if kw.get("phase2") else "")
            try:
                if engine == "kron":
                    f = jax.jit(lambda y_: api.logpdf(fx, y_, engine="kron"))
                    arg = y
                else:
                    f = jax.jit(
                        lambda y_, e=engine, kw=kw: lg.logpdf(
                            model, y_, engine=e, **kw
                        )
                    )
                    arg = y_tf
                dt, cs, v = timed(f, arg)
                print(
                    f"Ns=247 Nt={Nt} [{label}]: {dt*1e3:.2f} ms "
                    f"({Ns*Nt/dt/1e6:.2f} Mobs/s) compile {cs:.0f}s val={v:.1f}",
                    flush=True,
                )
            except Exception:
                print(f"Ns=247 Nt={Nt} [{label}] FAILED:", flush=True)
                traceback.print_exc()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
