"""Measure the steady engine's N-independent constant-operator floor at
DTC dims (VERDICT r2 item 4 / ROADMAP item 5).

The floor is the cost of the O(1) constant algebra (warmup power chain +
fixed-point squarings + steady-state operator assembly): measured as the
steady DTC elbo forward at a tiny Nt (256), where the data pass is
negligible. Also times the Nt=100k forward (done-criterion: < ~100 ms,
was 217 ms in round 2 with XLA custom-call chains).

Run on the TPU backend, backgrounded:
  PYTHONPATH=/root/repo:$PYTHONPATH nohup python probes/steady_floor_probe.py \
      > /tmp/steady_floor.log 2>&1 &
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
from temporalgps_tpu.space_time import RectilinearGrid, Separable, elbo

dtype = jnp.float32
Ns, M = 50, 10  # D = 3*10 = 30 bottleneck dims at the DTC emission
r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
z = jnp.asarray(np.linspace(-3, 3, M), dtype)
rng = np.random.default_rng(0)


def make(Nt):
    x = RectilinearGrid(
        r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt)
    )
    y = jnp.asarray(rng.standard_normal(Nt * Ns), dtype)
    kern = Separable(EQ(), Matern52())
    fx = to_sde(GP(kern), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    f = jax.jit(lambda y_: elbo(fx, y_, z, engine="steady"))
    return f, y


def timed(f, y, iters=8):
    t0 = time.perf_counter()
    v = float(f(y))
    compile_s = time.perf_counter() - t0
    # amortised: enqueue iters, fetch only the last scalar
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = f(y)
    v = float(out)
    per = (time.perf_counter() - t0) / iters
    return compile_s, per, v


for Nt in (256, 100_000):
    f, y = make(Nt)
    cs, per, v = timed(f, y)
    print(
        f"steady DTC elbo fwd Ns={Ns} M={M} Nt={Nt}: {per*1e3:.1f} ms "
        f"(compile {cs:.0f}s, value {v:.2f})",
        flush=True,
    )
print("DONE", flush=True)
