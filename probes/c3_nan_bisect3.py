"""Stage-3 bisect: is XLA-TPU's f64 cholesky/triangular_solve custom call
the NaN source in the f64 grams_block head?

Stage 2: grams_sequential f64 (no cholesky anywhere — scalar-emission
divisions only) is finite on TPU; grams_block f64 (whose combine calls
assoc._minv -> psd.cholesky at batch B < _UNROLL_MIN_BATCH=256, i.e. the
native XLA custom call) NaNs at every (k, B_w) tried. CLAUDE.md already
records TPU f64 holes (LuDecomposition: "Only F32 and C64").

  m0  jnp.linalg.cholesky on (64, 5, 5) f64 SPD batch — finite? vs CPU.
  m1  jax.scipy.linalg.solve_triangular f64 (64, 5, 5) — finite? vs CPU.
  m2  assoc._minv on a (64,)-batched f64 SPD pair — finite?
  m3  grams_block f64 k=2048 B=64 under psd.latency_mode() (forces the
      unrolled custom-call-free cholesky/tri_solve) — the candidate fix.
  m4  same under jax.default_matmul_precision('highest') only (bench ctx).

Run: cd /root/repo && PYTHONPATH=/root/repo:$PYTHONPATH \
  nohup python probes/c3_nan_bisect3.py > /tmp/c3_bisect3.log 2>&1 &
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
from temporalgps_tpu.gp.lti_sde import basis_setup
from temporalgps_tpu.ops import assoc, basis as basis_ops
from temporalgps_tpu.ops import steady as sd
from temporalgps_tpu.utils import psd

dtype = jnp.float32
N = 4_096


def run(name, fn, *args):
    t0 = time.perf_counter()
    try:
        out = fn(*args)
        fm = jax.tree_util.tree_map(
            lambda l: bool(np.isfinite(np.asarray(l)).all()), out
        )
        print(f"[{name}] ({time.perf_counter()-t0:.0f}s) finite={fm}",
              flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] ({time.perf_counter()-t0:.0f}s) RAISED {e!r}",
              flush=True)
        return None


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(2)
    Araw = rng.standard_normal((64, 5, 5))
    SPD = jnp.asarray(
        Araw @ np.swapaxes(Araw, -1, -2) + 0.5 * np.eye(5), jnp.float64
    )
    Bmat = jnp.asarray(rng.standard_normal((64, 5, 5)), jnp.float64)

    L_tpu = run("m0 chol f64 (64,5,5) TPU", jax.jit(jnp.linalg.cholesky), SPD)
    if L_tpu is not None:
        L_cpu = np.linalg.cholesky(np.asarray(SPD))
        print("  m0 max |TPU - CPU|:",
              float(np.max(np.abs(np.asarray(L_tpu) - L_cpu))), flush=True)

    X_tpu = run(
        "m1 tri_solve f64 TPU",
        jax.jit(lambda L, B: jax.scipy.linalg.solve_triangular(
            L, B, lower=True)),
        jnp.asarray(np.linalg.cholesky(np.asarray(SPD))), Bmat,
    )
    if X_tpu is not None:
        import scipy.linalg as sla

        L_c = np.linalg.cholesky(np.asarray(SPD))
        X_c = np.stack([
            sla.solve_triangular(L_c[i], np.asarray(Bmat)[i], lower=True)
            for i in range(64)
        ])
        print("  m1 max |TPU - CPU|:",
              float(np.max(np.abs(np.asarray(X_tpu) - X_c))), flush=True)

    Jraw = rng.standard_normal((64, 5, 5))
    Jpsd = jnp.asarray(Jraw @ np.swapaxes(Jraw, -1, -2), jnp.float64)
    M_tpu = run("m2 assoc._minv f64 TPU", jax.jit(assoc._minv), SPD, Jpsd)
    if M_tpu is not None:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            M_cpu = np.asarray(jax.jit(assoc._minv)(SPD, Jpsd))
        print("  m2 max |TPU - CPU|:",
              float(np.max(np.abs(np.asarray(M_tpu) - M_cpu))), flush=True)

    # the head at the failing shape, under candidate fixes
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    p0 = jnp.log(jnp.asarray([1.0, 0.5, 0.1], dtype))

    def make_fx(p):
        s2, sc, noise = jnp.exp(p)
        kern = (
            s2 * Matern52()
            + 0.6 * Matern32().stretch(sc)
            + 0.3 * ApproxPeriodic(0.5)
        )
        return to_sde(GP(kern), ArrayStorage(dtype))(x, noise)

    model, M, P0 = basis_setup(make_fx(p0))
    y = jax.device_put(
        np.random.default_rng(0).standard_normal(1_000_000).astype(np.float32)
    )[:N]
    Y = jnp.concatenate([y[:, None], M], axis=-1)
    w_off = jnp.zeros(Y.shape[-1], dtype).at[0].set(1.0)
    hi = jnp.float64

    def head():
        mdl = basis_ops._astype_tree(sd._trim(model, 2048), hi)
        return basis_ops.grams_block(
            mdl, Y[:2048].astype(hi), w_off.astype(hi), n_blocks=64,
            final_state=True,
        )

    def head_unrolled():
        with psd.latency_mode():
            return head()

    run("m3 head f64 k=2048 B=64 latency_mode", jax.jit(head_unrolled))

    def head_highest():
        with jax.default_matmul_precision("highest"):
            return head()

    run("m4 head f64 k=2048 B=64 highest", jax.jit(head_highest))
    print("bisect3 done", flush=True)


if __name__ == "__main__":
    main()
