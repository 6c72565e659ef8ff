"""Piece-wise TPU-vs-CPU comparison of the NEW c3 basis/steady path.

After the warmup-seeded Newton constants (round 5): the full fwd-grad at
the gate shape is rel 1.48e-3 vs the oracle — 1.5x over the 1e-3 gate.
This isolates which piece still carries ~1e-3-grade TPU error:

  p1 sequential f64 head outputs (ld_w, gram_w, m_k, P_k) + their jvp
  p2 Newton-polished constants from a FIXED seed + their jvp
  p3 tail-only loss (head outputs fixed constants) value + jvp

Run: PYTHONPATH=/root/repo:$PYTHONPATH \
  nohup python probes/c3_piece_check.py > /tmp/c3_piece.log 2>&1 &
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
from temporalgps_tpu.ops import basis as bops
from temporalgps_tpu.ops import steady as sd
from temporalgps_tpu.config import precision_ctx

dtype = jnp.float32
N, k = 4096, 2048
y_np = np.random.default_rng(0).standard_normal(N).astype(np.float32)
TANG = jnp.asarray([1.0, -0.5, 0.25], dtype)


def setup(p):
    s2, sc, noise = jnp.exp(p)
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    kern = (s2 * Matern52() + 0.6 * Matern32().stretch(sc)
            + 0.3 * ApproxPeriodic(0.5))
    fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
    model, M, P0 = basis_setup(fx)
    Y = jnp.concatenate([jnp.asarray(y_np, dtype)[:, None], M], axis=-1)
    w_off = jnp.zeros(M.shape[-1] + 1, dtype).at[0].set(1.0)
    return model, Y, w_off, P0


def head(p):
    model, Y, w_off, _ = setup(p)
    hi = sd._hi(dtype)
    with precision_ctx(model.latent_dim):
        ld, gram, m_k, P_k = bops.grams_sequential(
            bops._astype_tree(sd._trim(model, k), hi),
            Y[:k].astype(hi), w_off.astype(hi), final_state=True,
        )
    return {"ld": ld, "gram": gram, "m_k": m_k, "P_k": P_k}


def consts(p):
    model, Y, w_off, _ = setup(p)
    with precision_ctx(model.latent_dim):
        h = head(p)
        ops = sd._steady_ops(model, dtype, N, n_warmup=k,
                             P_seed=jax.lax.stop_gradient(h["P_k"]))
    return {kk: ops[kk] for kk in ("G", "K", "S", "logdetS", "P_ss")}


def full(p):
    model, Y, w_off, P0 = setup(p)
    with precision_ctx(model.latent_dim):
        ld, gram = bops.grams_steady(model, Y, w_off, n_warmup=k,
                                     fwd_mode=True)
        return bops.marginalised_lml(ld, gram, P0, N, dtype)


def main():
    print("devices:", jax.devices(), flush=True)
    cpu = jax.local_devices(backend="cpu")[0]
    p0 = jnp.log(jnp.asarray([1.0, 0.5, 0.1], dtype))
    for name, fn in [("p1 head", head), ("p2 consts", consts),
                     ("p3 full", full)]:
        t0 = time.perf_counter()
        jvp_f = jax.jit(lambda q: jax.jvp(fn, (q,), (TANG,)))
        got_v, got_t = jvp_f(p0)
        with jax.default_device(cpu):
            want_v, want_t = jax.jit(
                lambda q: jax.jvp(fn, (q,), (TANG,)))(p0)
        for tag, g, w in [("val", got_v, want_v), ("jvp", got_t, want_t)]:
            rels = jax.tree_util.tree_map(
                lambda a, b: float(
                    np.max(np.abs(np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64))
                           / (np.abs(np.asarray(b, np.float64)).max()
                              + 1e-12))), g, w)
            print(f"[{name} {tag}] ({time.perf_counter()-t0:.0f}s) {rels}",
                  flush=True)
    print("piece check done", flush=True)


if __name__ == "__main__":
    main()
