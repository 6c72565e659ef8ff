"""c5 steady elbo+grad compile failure isolation: does the latency_mode
unrolled constant chain (eef851a) blow up the TPU compile (SIGKILL)?

A: as-shipped vag compile at the c5 shape.
B: same with psd latency_mode disabled (constant chain uses XLA custom
   calls like round 2) — if B compiles where A dies, the unrolls are the
   cause.
Run with TGPS_VARIANT=A or B.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/tgps_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

VARIANT = os.environ.get("TGPS_VARIANT", "A")
if VARIANT == "B":
    from temporalgps_tpu.utils import psd
    class _noop:
        def __enter__(self): return self
        def __exit__(self, *e): return False
    psd.latency_mode = _noop  # before steady imports it? steady imports psd module, uses psd.latency_mode at call time
from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import EQ, GP, ArrayStorage, Matern52, to_sde
from temporalgps_tpu.space_time import RectilinearGrid, Separable, elbo

dtype = jnp.float32
Ns, Nt, M = 50, 1_000_000, 5
r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
z = jnp.asarray(np.linspace(-3, 3, M), dtype)
x = RectilinearGrid(r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt))
y = jnp.asarray(np.random.default_rng(0).standard_normal(Nt * Ns), dtype)

def f(p, y_):
    s2, sc, noise = jnp.exp(p)
    kern = s2 * Separable(EQ().stretch(sc), Matern52())
    fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
    return elbo(fx, y_, z, engine="steady")

p0 = jnp.asarray([0.0, 0.0, -2.3], dtype)
g = jax.jit(jax.value_and_grad(f))
t0 = time.perf_counter()
try:
    v, gr = g(p0, y)
    v = float(v)
    print(f"[{VARIANT}] grad compile+run OK in {time.perf_counter()-t0:.0f}s v={v:.2f} g={np.asarray(gr)}", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        v2, gr2 = g(p0, y)
    _ = float(v2)
    print(f"[{VARIANT}] per-call {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)
except Exception as e:
    print(f"[{VARIANT}] FAILED after {time.perf_counter()-t0:.0f}s: {type(e).__name__}: {e}", flush=True)
print("DONE", flush=True)
