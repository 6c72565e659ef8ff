"""Find the lossy op in the TPU f64-emulated sequential head.

probes/c3_piece_check.py: head outputs err 1e-5..3e-4 (m_k worst) vs CPU —
~f32-grade per-step error somewhere, not the 2^-48 the float32-pair
emulation should deliver (micro ops are exact). Sweep:
  * k in {64, 256, 1024, 2048}: linear error growth => per-step bias.
  * precision ctx on/off: HIGHEST vs default dots on the emulated f64 ops.

Run: PYTHONPATH=/root/repo:$PYTHONPATH \
  nohup python probes/c3_head_bisect.py > /tmp/c3_head.log 2>&1 &
"""

import contextlib
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
from temporalgps_tpu.gp.lti_sde import basis_setup
from temporalgps_tpu.ops import basis as bops
from temporalgps_tpu.ops import steady as sd

dtype = jnp.float32
N = 4096
y_np = np.random.default_rng(0).standard_normal(N).astype(np.float32)


def head(p, kk, hi_prec):
    s2, sc, noise = jnp.exp(p)
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    kern = (s2 * Matern52() + 0.6 * Matern32().stretch(sc)
            + 0.3 * ApproxPeriodic(0.5))
    fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
    model, M, P0 = basis_setup(fx)
    Y = jnp.concatenate([jnp.asarray(y_np, dtype)[:, None], M], axis=-1)
    w_off = jnp.zeros(M.shape[-1] + 1, dtype).at[0].set(1.0)
    ctx = (jax.default_matmul_precision("highest") if hi_prec
           else contextlib.nullcontext())
    with ctx:
        ld, gram, m_k, P_k = bops.grams_sequential(
            bops._astype_tree(sd._trim(model, kk), jnp.float64),
            Y[:kk].astype(jnp.float64), w_off.astype(jnp.float64),
            final_state=True,
        )
    return {"ld": ld, "gram": gram, "m_k": m_k, "P_k": P_k}


def main():
    print("devices:", jax.devices(), flush=True)
    cpu = jax.local_devices(backend="cpu")[0]
    p0 = jnp.log(jnp.asarray([1.0, 0.5, 0.1], dtype))
    for hi_prec in (True, False):
        for kk in (64, 256, 1024, 2048):
            t0 = time.perf_counter()
            f = jax.jit(lambda q: head(q, kk, hi_prec))
            got = f(p0)
            with jax.default_device(cpu):
                want = jax.jit(lambda q: head(q, kk, hi_prec))(p0)
            rels = jax.tree_util.tree_map(
                lambda a, b: float(
                    np.max(np.abs(np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64))
                           / (np.abs(np.asarray(b, np.float64)).max()
                              + 1e-12))), got, want)
            print(f"[hi={hi_prec} k={kk}] ({time.perf_counter()-t0:.0f}s) "
                  f"{rels}", flush=True)
    print("head bisect done", flush=True)


if __name__ == "__main__":
    main()
