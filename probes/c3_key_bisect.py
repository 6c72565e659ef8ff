"""Per-key bisect of the _steady_ops reverse wrongness on TPU (round 5).

probes/c3_grad_bisect_tpu.py: the consts-chain grad (loss C) differs wildly
between TPU and CPU at the real c3 reduced model, while the same chain on a
random dense model (probes/f64_rev_micro.py r5) is clean to 3e-7. This
splits C by operator key: grad of sum(ops[key] * W_key) per key, plus the
FORWARD value diff of every key, on TPU and in-process CPU. Run the same
script with TGPS_FRESH_CPU=1 in a separate cache-free process to adjudicate
which side is right.

Run: PYTHONPATH=/root/repo:$PYTHONPATH \
  nohup python probes/c3_key_bisect.py > /tmp/c3_key.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

FRESH = os.environ.get("TGPS_FRESH_CPU", "") == "1"
if FRESH:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/tgps_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import (GP, ApproxPeriodic, ArrayStorage, Matern32,
                                Matern52, to_sde)
from temporalgps_tpu.gp.lti_sde import basis_setup
from temporalgps_tpu.ops import steady as sd
from temporalgps_tpu.config import precision_ctx

dtype = jnp.float32
N, k = 4096, 2048
KEYS = ["G", "K", "c_w", "A0", "a0", "H", "S", "logdetS", "P_ss"]
rngw = np.random.default_rng(7)
_W = {}


def w_like(tag, shape):
    if tag not in _W:
        _W[tag] = rngw.standard_normal(shape) if shape else float(
            rngw.standard_normal()
        )
    return jnp.asarray(_W[tag], dtype=jnp.result_type(jnp.float32))


def make_ops(p):
    s2, sc, noise = jnp.exp(p)
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    kern = (s2 * Matern52() + 0.6 * Matern32().stretch(sc)
            + 0.3 * ApproxPeriodic(0.5))
    fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
    model, _, _ = basis_setup(fx)
    with precision_ctx(model.latent_dim):
        return sd._steady_ops(model, dtype, N, n_warmup=k)


def loss_key(p, key):
    ops = make_ops(p)
    v = ops[key]
    return jnp.sum(v.astype(jnp.float32) * w_like(key, v.shape))


def main():
    print("devices:", jax.devices(), "FRESH_CPU:", FRESH, flush=True)
    p0 = jnp.log(jnp.asarray([1.0, 0.5, 0.1], dtype))

    # forward values of every key (adjudicates fwd wrongness)
    ops = jax.jit(make_ops)(p0)
    for key in KEYS:
        val = np.asarray(ops[key], np.float64)
        print(f"fwd {key}: {val.ravel()[:6]}", flush=True)

    targets = [("cpu", jax.local_devices(backend="cpu")[0])] if not FRESH \
        else [("fresh", None)]
    if not FRESH:
        targets = [("tpu", None)] + targets
    for key in KEYS:
        for tag, dev in targets:
            t0 = time.perf_counter()
            try:
                f = jax.jit(jax.grad(lambda p: loss_key(p, key)))
                if dev is not None:
                    with jax.default_device(dev):
                        g = np.asarray(f(p0), np.float64)
                else:
                    g = np.asarray(f(p0), np.float64)
                print(f"grad[{key}] {tag}: {g} "
                      f"({time.perf_counter()-t0:.0f}s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"grad[{key}] {tag} RAISED {type(e).__name__}: {e}",
                      flush=True)
    print("key bisect done", flush=True)


if __name__ == "__main__":
    main()
