"""Confirm the scale-underflow theory for the TPU f64-emulation wrongness.

probes/c3_key_bisect.py: _steady_ops FORWARD values (P_ss, G, K, S) are
wildly wrong on TPU at the c3 model's dt=1e-3 (G spectral radius 1.2!),
while exact on CPU and exact on TPU for O(1)-scale random elements
(f64_rev_micro r4). Theory: XLA:TPU emulates f64 as a float32 pair; the
error limb of quantities ~1e-15 underflows f32's range in products,
collapsing effective precision, and the Riccati chain amplifies it.

Prediction: the TPU-vs-CPU error of _steady_filter_cov / _steady_ops decays
sharply as dt grows (Q entries ~ dt^k). Sweep dt for the exact c3 kernel;
also sweep a pure Matern52 (the c2/steady family) to see whether the
steady ENGINE itself is affected at its bench shapes (dt=1e-3).

Run: PYTHONPATH=/root/repo:$PYTHONPATH \
  nohup python probes/f64_scale_sweep.py > /tmp/f64_scale.log 2>&1 &
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
from temporalgps_tpu.gp.lti_sde import basis_setup, build_lgssm
from temporalgps_tpu.ops import steady as sd
from temporalgps_tpu.config import precision_ctx

dtype = jnp.float32
N = 4096


def ops_fn(p, dt_step, kind):
    # p MUST be a traced jit argument: with a constant-only graph XLA
    # constant-folds the whole chain on the HOST in true f64 and the
    # comparison measures nothing (first version of this probe did that —
    # everything matched to 1e-12 while the traced graph is wildly wrong).
    s2, sc, noise = jnp.exp(p)
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(dt_step, dtype), N)
    if kind == "c3":
        kern = (s2 * Matern52() + 0.6 * Matern32().stretch(sc)
                + 0.3 * ApproxPeriodic(0.5))
        fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
        model = basis_setup(fx)[0]
    else:
        fx = to_sde(GP(s2 * Matern52().stretch(sc)),
                    ArrayStorage(dtype))(x, noise)
        model = build_lgssm(fx)
    with precision_ctx(model.latent_dim):
        ops = sd._steady_ops(model, dtype, N, n_warmup=2048)
    out = {k: ops[k] for k in ("P_ss", "G", "S", "logdetS", "K")}
    out["Q"] = model.trans.Qs.value
    out["A"] = model.trans.As.value
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    cpu = jax.local_devices(backend="cpu")[0]
    p0 = jnp.log(jnp.asarray([1.0, 0.5, 0.1], dtype))
    for kind in ("c3", "m52"):
        for dt_step in (1e-3, 1e-2, 1e-1, 0.5):
            t0 = time.perf_counter()
            f = jax.jit(lambda q: ops_fn(q, dt_step, kind))
            got = jax.tree_util.tree_map(np.asarray, f(p0))
            with jax.default_device(cpu):
                want = jax.tree_util.tree_map(np.asarray, jax.jit(
                    lambda q: ops_fn(q, dt_step, kind))(p0))
            rels = {
                k: float(np.max(np.abs(got[k] - want[k])
                                / (np.abs(want[k]).max() + 1e-12)))
                for k in got
            }
            worst = max(rels.values())
            print(f"[{kind} dt={dt_step:g}] ({time.perf_counter()-t0:.0f}s) "
                  f"worst={worst:.2e} " + " ".join(
                      f"{k}={v:.1e}" for k, v in rels.items()), flush=True)
    print("scale sweep done", flush=True)


if __name__ == "__main__":
    main()
