"""Bisect the round-4 TPU reverse-mode NaN in basis/steady (bench c3 gate).

The driver's BENCH_r04 run got g32=[nan nan nan] at the c3 grad
cross-check shape (N=4096, n_warmup=2048, R=15, D_reduced=5, f32,
reverse-mode, jit). CPU at the same shape is finite and matches the f64
oracle to ~1e-5. This probe reproduces on the real TPU, then bisects:

  t0  value at the shape (finite?)
  t1  reverse grad, exact bench path (expect NaN)
  t2  reverse grad, head_dtype=f32   (f64-emulated head out of the loop)
  t3  reverse grad, sub_engine=block (exact f32 grams, no steady pieces)
  t4  reverse grad, n_warmup=64      (tiny head, long late segment)
  t5  fwd-mode grad, exact bench shape (round-4 probes said this is fine)
  t6  reverse grad through affine_const_states alone at the kron-lifted
      shape (75-dim state, M=2048) — the _acs custom-VJP in isolation
  t7  head-only loss: grams_block on the f64-cast trimmed model (the
      exact warmup-head computation inside grams_steady)

Run: cd /root/repo && PYTHONPATH=/root/repo:$PYTHONPATH \
  nohup python probes/c3_nan_bisect.py > /tmp/c3_bisect.log 2>&1 &
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
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.gp.lti_sde import basis_setup
from temporalgps_tpu.learning import value_and_grad_fwd
from temporalgps_tpu.ops import basis as basis_ops
from temporalgps_tpu.ops import steady as sd

dtype = jnp.float32
N = 4_096
K_WARM = 2_048


def make_fx(p, x_):
    s2, sc, noise = jnp.exp(p)
    kern = (
        s2 * Matern52()
        + 0.6 * Matern32().stretch(sc)
        + 0.3 * ApproxPeriodic(0.5)
    )
    return to_sde(GP(kern), ArrayStorage(dtype))(x_, noise)


def run(name, fn, *args):
    t0 = time.perf_counter()
    try:
        out = fn(*args)
        out = jax.tree_util.tree_map(np.asarray, out)
        print(f"[{name}] ({time.perf_counter()-t0:.0f}s) -> {out}", flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] ({time.perf_counter()-t0:.0f}s) RAISED {e!r}",
              flush=True)
        return None


def main():
    print("devices:", jax.devices(), flush=True)
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    y = jax.device_put(
        np.random.default_rng(0).standard_normal(1_000_000).astype(np.float32)
    )[:N]
    p0 = jnp.log(jnp.asarray([1.0, 0.5, 0.1], dtype))

    def loss(p, kw):
        return api.logpdf(make_fx(p, x), y, engine="basis", **kw)

    kw0 = dict(sub_engine="steady", n_warmup=K_WARM, nan_fallback=False)

    run("t0 value steady", jax.jit(lambda p: loss(p, kw0)), p0)
    run("t1 rev-grad steady (bench path)",
        jax.jit(jax.grad(lambda p: loss(p, kw0))), p0)
    run("t2 rev-grad steady f32 head",
        jax.jit(jax.grad(lambda p: loss(
            p, dict(kw0, head_dtype=jnp.float32)))), p0)
    run("t3 rev-grad block",
        jax.jit(jax.grad(lambda p: loss(
            p, dict(sub_engine="block", nan_fallback=False)))), p0)
    run("t4 rev-grad steady warmup=64",
        jax.jit(jax.grad(lambda p: loss(
            p, dict(kw0, n_warmup=64)))), p0)
    run("t5 fwd-grad steady",
        jax.jit(lambda p: value_and_grad_fwd(
            lambda q: loss(q, kw0))(p)[1]), p0)

    # t6: _acs custom VJP in isolation at the kron-lifted shape.
    model, M, P0 = basis_setup(make_fx(p0, x))
    D = model.latent_dim
    R = M.shape[-1] + 1
    rng = np.random.default_rng(1)
    GF = jnp.kron(
        jnp.eye(R, dtype=dtype),
        jnp.asarray(0.9 * rng.standard_normal((D, D)) / D, dtype),
    )
    WF = jnp.asarray(rng.standard_normal((N - K_WARM, R * D)), dtype)
    m0F = jnp.asarray(rng.standard_normal(R * D), dtype)

    def acs_loss(GF_, WF_, m0F_):
        out = sd.affine_const_states(GF_, WF_, m0F_, block_len=16)
        return jnp.sum(out**2)

    g6 = run("t6 rev-grad _acs kron-lifted",
             jax.jit(jax.grad(acs_loss, argnums=(0, 1, 2))), GF, WF, m0F)
    if g6 is not None:
        print("t6 finite:", [bool(np.isfinite(g).all()) for g in g6],
              flush=True)

    # t7: warmup-head-only loss — exactly grams_steady's head computation.
    w_off = jnp.zeros(R, dtype).at[0].set(1.0)

    def head_loss(p):
        mdl, Mb, _ = basis_setup(make_fx(p, x))
        Y = jnp.concatenate([y[:, None], Mb], axis=-1)
        hi = sd._hi(dtype)
        k = K_WARM
        B_w = max(64, k // 64)
        while k % B_w:
            B_w //= 2
        ld_w, gram_w, m_k, _ = basis_ops.grams_block(
            basis_ops._astype_tree(sd._trim(mdl, k), hi),
            Y[:k].astype(hi),
            w_off.astype(hi),
            n_blocks=B_w,
            final_state=True,
        )
        return (ld_w + jnp.sum(gram_w) + jnp.sum(m_k)).astype(dtype)

    run("t7 rev-grad f64 warmup head only",
        jax.jit(jax.grad(head_loss)), p0)

    print("bisect done", flush=True)


if __name__ == "__main__":
    main()
