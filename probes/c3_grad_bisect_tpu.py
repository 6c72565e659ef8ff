"""Bisect the TPU-only f32 reverse-grad wrongness in basis/steady (round 5).

State: values fine everywhere; CPU f32 grads match the f64 oracle (3e-5);
TPU f32 grads are ~[2308, 4879, 15396] vs oracle [2.14, 15.5, 18160] even
after (a) psd._avoid_native (fixed the round-4 NaN) and (b) ambient-precision
capture in the _acs/_fisher/_pallas custom-VJP bwds.

Sub-losses, each a scalar contraction with FIXED weights, each computed on
TPU and on host CPU with identical code; a big rel diff marks the guilty
segment of grams_steady's reverse path:

  A  head only: grams_block on the f64-cast trimmed model (k steps).
  C  constants only: sd._steady_ops outputs (the O(1) f64 chain, incl. the
     round-5 lax.scan squaring).
  B  tail only: full grams_steady replica with stop_gradient on the head
     outputs AND on the _steady_ops constants (isolates _acs + E + lml).
  B2 tail + constants: stop_gradient on the head only.

Run: cd /root/repo && PYTHONPATH=/root/repo:$PYTHONPATH \
  nohup python probes/c3_grad_bisect_tpu.py > /tmp/c3_gbisect.log 2>&1 &
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
rngw = np.random.default_rng(7)


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


_W = {}


def w_like(tag, arr):
    # store HOST arrays: a jnp array created inside a trace is a tracer and
    # caching it across traces is a leak
    if tag not in _W:
        _W[tag] = rngw.standard_normal(arr.shape)
    return jnp.asarray(_W[tag], arr.dtype)


def head_outputs(model, Y, w_off):
    hi = sd._hi(dtype)
    B_w = max(64, k // 64)
    while k % B_w:
        B_w //= 2
    return bops.grams_block(
        bops._astype_tree(sd._trim(model, k), hi),
        Y[:k].astype(hi), w_off.astype(hi), n_blocks=B_w, final_state=True,
    )


def loss_A(p):
    model, Y, w_off, _ = setup(p)
    with precision_ctx(model.latent_dim):
        ld, gram, m_k, P_k = head_outputs(model, Y, w_off)
        return (ld.astype(dtype) * 0.1
                + jnp.sum(gram.astype(dtype) * w_like("gA", gram))
                + jnp.sum(m_k.astype(dtype) * w_like("mA", m_k)))


def loss_C(p):
    model, Y, w_off, _ = setup(p)
    with precision_ctx(model.latent_dim):
        ops = sd._steady_ops(model, dtype, N, n_warmup=k)
        out = 0.0
        for key in ("G", "K", "c_w", "A0", "a0", "H", "h"):
            out = out + jnp.sum(ops[key] * w_like(key, ops[key]))
        return out + ops["S"] * 0.3 + ops["logdetS"] * 0.7


def grams_steady_replica(model, Y, w_off, *, sg_head, sg_ops):
    """grams_steady body (ops/basis.py) with optional stop_gradients."""
    t = model.trans
    ld_w, gram_w, m_k, _ = head_outputs(model, Y, w_off)
    if sg_head:
        ld_w, gram_w, m_k = jax.tree_util.tree_map(
            jax.lax.stop_gradient, (ld_w, gram_w, m_k))
    ops = sd._steady_ops(model, dtype, N, n_warmup=k)
    if sg_ops:
        ops = jax.tree_util.tree_map(jax.lax.stop_gradient, ops)
    y_late = Y[k:]
    Mlen = N - k
    R = Y.shape[-1]
    G, K, c_w = ops["G"], ops["K"], ops["c_w"]
    A0, a0, H, h, S = ops["A0"], ops["a0"], ops["H"], ops["h"], ops["S"]
    I_R = jnp.eye(R, dtype=dtype)
    GF = jnp.kron(I_R, G)
    WF = y_late @ jnp.kron(I_R, K[:, None]).T + (
        w_off[:, None] * c_w[None, :]).reshape(-1)[None, :]
    m0 = m_k.astype(dtype)
    meansF = sd.affine_const_states(GF, WF, m0.T.reshape(-1), block_len=16)
    g = A0.T @ H
    c0 = H @ a0 + h
    Zg = jnp.kron(I_R, g[:, None])
    proj_prev = jnp.concatenate([(g @ m0)[None, :], meansF[:-1] @ Zg], axis=0)
    E = y_late - proj_prev - c0 * w_off[None, :]
    gram = gram_w.astype(dtype) + (E.T @ E) / S
    ld = ld_w.astype(dtype) + Mlen * ops["logdetS"]
    return ld, gram


def loss_tail(p, sg_head, sg_ops):
    model, Y, w_off, P0 = setup(p)
    with precision_ctx(model.latent_dim):
        ld, gram = grams_steady_replica(
            model, Y, w_off, sg_head=sg_head, sg_ops=sg_ops)
        return bops.marginalised_lml(ld, gram, P0, N, dtype)


def loss_full(p):
    return loss_tail(p, False, False)


def main():
    print("devices:", jax.devices(), flush=True)
    p0 = jnp.log(jnp.asarray([1.0, 0.5, 0.1], dtype))
    cpu = jax.local_devices(backend="cpu")[0]
    import os

    sel = os.environ.get("C3_BISECT_ONLY", "")
    cases = [
        ("A head", loss_A),
        ("C consts", loss_C),
        ("B tail-only", lambda p: loss_tail(p, True, True)),
        ("B2 tail+consts", lambda p: loss_tail(p, True, False)),
        ("FULL", loss_full),
    ]
    if sel:
        cases = [c for c in cases if c[0].split()[0] in sel.split(",")]
    for name, fn in cases:
        t0 = time.perf_counter()
        try:
            g_t = np.asarray(jax.jit(jax.grad(fn))(p0), np.float64)
            with jax.default_device(cpu):
                g_c = np.asarray(jax.jit(jax.grad(fn))(p0), np.float64)
            rel = float(np.max(np.abs(g_t - g_c) / (np.abs(g_c) + 1e-9)))
            print(f"[{name}] ({time.perf_counter()-t0:.0f}s) rel={rel:.2e}\n"
                  f"   tpu={g_t}\n   cpu={g_c}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[{name}] RAISED {type(e).__name__}: {e}", flush=True)
    print("bisect done", flush=True)


if __name__ == "__main__":
    main()
