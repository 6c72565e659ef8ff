"""cm (component-major) lti pipeline vs row layout at the c3 shape
(D=19 Sum kernel, N=1M, f32) and a DTC-dim scalar model (D=30).

Expect: row layout pays the (8, 128) tile-padding tax (~8.5x dense HBM
bytes at D=19); cm should land several-fold faster if the pipeline is
bandwidth-bound (ops/cm.py docstring).
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
from temporalgps_tpu.gp import (GP, ApproxPeriodic, ArrayStorage, Matern12,
                                Matern52, to_sde)
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.ops import lti, lti_cm

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
    val = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = max((time.perf_counter() - t0 - fl) / iters, 1e-9)
    print(f"{name}: {dt*1e3:.2f} ms (compile {cs:.0f}s) val={val:.4f}",
          flush=True)
    return dt, val


def main():
    print(jax.devices(), flush=True)
    DT = jnp.float32
    N = 1_000_000
    k = (
        Matern52().stretch(0.8) * 2.0
        + Matern12().stretch(4.0) * 0.5
        + ApproxPeriodic(0.9, n_cos=3).stretch(1.2) * 1.0
    )
    for name, kern, noise in [
        ("c3like D~19", k, 0.3),
        ("matern52 D=3", Matern52(), 0.2),
    ]:
        x = RegularSpacing(jnp.asarray(0.0, DT), jnp.asarray(1e-2, DT), N)
        fx = to_sde(GP(kern), ArrayStorage(DT))(x, jnp.asarray(noise, DT))
        m = api.build_lgssm(fx)
        print(f"== {name}: latent_dim={m.latent_dim}", flush=True)
        y = jnp.asarray(np.random.default_rng(0).standard_normal(N), DT)
        d_row, v_row = timed(
            f"{name} row", jax.jit(lambda y_: lti._lml_from_filter(
                lti._filter_pass(m, y_))), y)
        d_cm, v_cm = timed(
            f"{name} cm ", jax.jit(lambda y_: lti_cm.logpdf(m, y_)), y)
        print(f"   speedup {d_row/d_cm:.2f}x  rel {abs(v_cm-v_row)/abs(v_row):.2e}",
              flush=True)
        # block_len sweep on the cm path
        for bl in (8, 32, 64):
            timed(f"{name} cm bl={bl}",
                  jax.jit(lambda y_, b=bl: lti_cm.logpdf(m, y_, block_len=b)),
                  y)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
