"""Dissect the c3 basis/steady logpdf cost on TPU (round 4).

bench c3 measured logpdf[basis/steady] = 790 ms / compile 422 s at
D_red=5, R=15, N=1M, k=13376. Parts timed separately (amortised honest
timing, each jitted alone so the persistent cache attributes compiles):

  (a) warmup head: grams_block on the f64-trimmed k-step model at the
      engine's default n_blocks=B_w=64 (L=209 scan iterations), and at
      n_blocks=k//64 (L=64 iterations, fatter batches),
  (b) _steady_ops constant chain alone (the known N-independent floor),
  (c) the late segment alone (affine_const_states_multi + einsum + gram)
      with constants passed in as arguments,
  (d) full grams_steady for reference.

Run backgrounded on TPU:
  PYTHONPATH=/root/repo:$PYTHONPATH nohup python \
      probes/grams_steady_dissect.py > /tmp/gs_dissect.log 2>&1 &
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
from temporalgps_tpu.gp import (GP, ApproxPeriodic, ArrayStorage, Matern32,
                                Matern52, to_sde)
from temporalgps_tpu.gp.lti_sde import basis_setup
from temporalgps_tpu.ops import basis as B
from temporalgps_tpu.ops import steady as sd

_RT = None


def _floor():
    global _RT
    if _RT is None:
        f = jax.jit(lambda x: x + 1.0)
        z = jnp.zeros(())
        f(z)
        t0 = time.perf_counter()
        for _ in range(10):
            r = f(z)
        float(r)
        _RT = (time.perf_counter() - t0) / 10
    return _RT


def timed(fn, *a, iters=10):
    t0 = time.perf_counter()
    o = fn(*a)
    jax.tree.map(lambda x: np.asarray(x), o)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*a)
    leaf = jax.tree.leaves(o)[0]
    float(jnp.sum(leaf))
    dt = (time.perf_counter() - t0 - _floor()) / iters
    return dt, cs


def main():
    print("devices:", jax.devices(), flush=True)
    dtype = jnp.float32
    N = 1_000_000
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    kern = (1.0 * Matern52() + 0.6 * Matern32().stretch(0.5)
            + 0.3 * ApproxPeriodic(0.5))
    fx = to_sde(GP(kern), ArrayStorage(dtype))(x, 0.1)
    red, Mcols, P0 = basis_setup(fx)
    k = int(sd.suggest_warmup(red))
    print(f"reduced D={red.latent_dim} det_cols={Mcols.shape[-1]} k={k}",
          flush=True)

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal(N), dtype)
    # grams inputs exactly as gp.lti_sde._logpdf_basis builds them
    Y = jnp.concatenate([y[:, None], Mcols], axis=-1)
    w = jnp.zeros(Mcols.shape[-1] + 1, dtype).at[0].set(1.0)
    R = Y.shape[-1]
    print(f"Y {Y.shape} dtype={Y.dtype}", flush=True)

    _floor()
    hi = sd._hi(dtype)
    mod_w = B._astype_tree(sd._trim(red, k), hi)
    Yw, ww = Y[:k].astype(hi), w.astype(hi)

    # (a) warmup head at the engine's default block split
    B_w = 64
    fa = jax.jit(lambda Y_, w_: B.grams_block(mod_w, Y_, w_, n_blocks=B_w,
                                              final_state=True)[:2])
    dt, cs = timed(fa, Yw, ww, iters=5)
    print(f"(a1) warmup f64 k={k} n_blocks=64 (L={k//64}): {dt*1e3:.2f} ms "
          f"compile {cs:.0f}s", flush=True)

    nb2 = k // 64
    fa2 = jax.jit(lambda Y_, w_: B.grams_block(mod_w, Y_, w_, n_blocks=nb2,
                                               final_state=True)[:2])
    dt, cs = timed(fa2, Yw, ww, iters=5)
    print(f"(a2) warmup f64 k={k} n_blocks={nb2} (L=64): {dt*1e3:.2f} ms "
          f"compile {cs:.0f}s", flush=True)

    # f32 warmup for comparison (value contract would change; timing only)
    mod_w32 = sd._trim(red, k)
    fa3 = jax.jit(lambda Y_, w_: B.grams_block(mod_w32, Y_, w_, n_blocks=nb2,
                                               final_state=True)[:2])
    dt, cs = timed(fa3, Y[:k], w, iters=5)
    print(f"(a3) warmup f32 n_blocks={nb2}: {dt*1e3:.2f} ms compile {cs:.0f}s",
          flush=True)

    # (b) constant chain
    fb = jax.jit(lambda: sd._steady_ops(red, dtype, N, n_warmup=k)["S"])
    dt, cs = timed(fb, iters=5)
    print(f"(b) _steady_ops: {dt*1e3:.2f} ms compile {cs:.0f}s", flush=True)

    # (c) late segment alone (constants as traced args)
    ops = jax.jit(lambda: sd._steady_ops(red, dtype, N, n_warmup=k))()
    D = red.latent_dim
    m0 = jnp.zeros((D, R), dtype)

    def late(G, K, c_w, A0, a0, H, h, S, y_late, w_):
        W = c_w[None, :, None] * w_[None, None, :] + K[None, :, None] * y_late[:, None, :]
        means = sd.affine_const_states_multi(G, W, m0)
        g = A0.T @ H
        c0 = H @ a0 + h
        proj = jnp.concatenate(
            [(g @ m0)[None, :], jnp.einsum("d,mdr->mr", g, means[:-1])], axis=0)
        E = y_late - proj - c0 * w_[None, :]
        return (E.T @ E) / S

    fc = jax.jit(late)
    args = (ops["G"], ops["K"], ops["c_w"], ops["A0"], ops["a0"], ops["H"],
            ops["h"], ops["S"], Y[k:], w)
    dt, cs = timed(fc, *args, iters=10)
    M = N - k
    print(f"(c) late segment M={M}: {dt*1e3:.2f} ms compile {cs:.0f}s",
          flush=True)

    # (d) full engine
    fd = jax.jit(lambda Y_, w_: B.grams_steady(red, Y_, w_, n_warmup=k))
    dt, cs = timed(fd, Y, w, iters=5)
    print(f"(d) grams_steady full: {dt*1e3:.2f} ms compile {cs:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
