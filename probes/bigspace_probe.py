"""TPU probe: exact spatio-temporal at the reference's own bench shape —
N_space=247, N_time in {25, 50, 100} (reference: bench/lgssm.jl:69-160,
D = 3*247 = 741) — plus Ns=50 x Nt=1000 (BASELINE config #4).

Engines: auto (default settings — must not NaN), sequential, kron.
Amortised honest timing.
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
from temporalgps_tpu.gp import EQ, GP, ArrayStorage, Matern52, to_sde
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.models import lgssm as lg
from temporalgps_tpu.space_time import RectilinearGrid, Separable

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


def run_shape(Ns, Nt, engines):
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
    x = RectilinearGrid(r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt))
    k = Separable(EQ().stretch(0.7), Matern52())
    fx = to_sde(GP(k), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    model = api.build_lgssm(fx)
    y_tf = jnp.asarray(rng.standard_normal((Nt, Ns)), dtype)
    vals = {}
    for engine in engines:
        try:
            if engine == "kron":
                y_fl = y_tf.reshape(-1)
                f = jax.jit(lambda y_: api.logpdf(fx, y_, engine="kron"))
                dt, cs = timed(f, y_fl)
                v = float(f(y_fl))
            else:
                f = jax.jit(lambda y_, e=engine: lg.logpdf(model, y_, engine=e))
                dt, cs = timed(f, y_tf)
                v = float(f(y_tf))
            vals[engine] = v
            finite = np.isfinite(v)
            print(
                f"Ns={Ns} Nt={Nt} D={model.latent_dim} [{engine or 'auto'}]: "
                f"{dt*1e3:8.2f} ms ({Ns*Nt/dt/1e6:6.2f} Mobs/s) compile {cs:.0f}s "
                f"val={v:.1f} finite={finite}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — probe resilience
            print(f"Ns={Ns} Nt={Nt} [{engine or 'auto'}] failed: {type(e).__name__}: {e}", flush=True)
    ref = vals.get(None, vals.get("sequential"))
    for e, v in vals.items():
        if ref is not None and e not in (None, "sequential"):
            print(f"  {e} rel-vs-auto: {abs(v-ref)/abs(ref):.2e}", flush=True)


def main():
    print(jax.devices(), flush=True)
    for Nt in [25, 100]:
        run_shape(247, Nt, [None, "kron"])  # auto (default) must not NaN
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
