"""Micro-bisect: f64 reverse-mode on TPU through the psd compact paths.

Round-5 state: basis/steady TPU reverse grads are wrong in BOTH the f64
warmup head (rel ~1) and the f64 _steady_ops constants chain (rel ~2e4),
while all forward values are exact to 1e-13 and CPU reverse is correct
(probes/c3_grad_bisect_tpu.py). Common denominator: f64-on-TPU reverse
graphs through psd compact/unrolled cholesky/tri_solve and the element
combines. This isolates the smallest wrong op.

  r0 grad through psd.cholesky (compact, D=5)
  r1 grad through psd.tri_solve (compact)
  r2 grad through psd.chol_solve
  r3 grad through one assoc._combine_filter (f64, latency_mode)
  r4 grad through the lax.scan squaring chain (_steady_filter_cov shape)
  r5 grad through full _steady_ops scalar-branch algebra
  r6 grad through affine_const_states f32 (M=2048, D=80) [tail leg]

Run: PYTHONPATH=/root/repo:$PYTHONPATH \
  nohup python probes/f64_rev_micro.py > /tmp/f64_rev.log 2>&1 &
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

from temporalgps_tpu.utils import psd
from temporalgps_tpu.ops import assoc

D = 5
rng = np.random.default_rng(0)


def rnd_spd(d, scale=1.0):
    X = rng.standard_normal((d, d))
    return np.eye(d) * 0.5 + scale * (X @ X.T) / d


P0 = jnp.asarray(rnd_spd(D), jnp.float64)
W = jnp.asarray(rng.standard_normal((D, D)), jnp.float64)
B0 = jnp.asarray(rng.standard_normal((D, D)), jnp.float64)
v0 = jnp.asarray(rng.standard_normal(D), jnp.float64)


def r0(P):
    with psd.latency_mode():
        return jnp.sum(psd.cholesky(P) * W)


def r1(P):
    with psd.latency_mode():
        L = psd.cholesky(jax.lax.stop_gradient(P)) + 0.01 * P
        return jnp.sum(psd.tri_solve(L, B0) * W)


def r2(P):
    with psd.latency_mode():
        L = psd.cholesky(P)
        return jnp.sum(psd.chol_solve(L, B0) * W)


# ALL randomness drawn at module scope: a draw inside a loss function is
# re-drawn per trace, so the TPU and CPU jits would compare DIFFERENT
# functions (first version of this probe did exactly that for r3-r5).
A_ELEM = jnp.asarray(0.9 * np.eye(D) + 0.05 * rng.standard_normal((D, D)),
                     jnp.float64)
A5 = 0.9 * np.eye(D) + 0.02 * rng.standard_normal((D, D))
H5 = rng.standard_normal(D)
G6 = 0.95 * np.eye(80) + 0.001 * rng.standard_normal((80, 80))
W6 = rng.standard_normal((2048, 80))
M6 = rng.standard_normal(80)


def mk_elem(P):
    return (A_ELEM, v0, P, 0.1 * v0,
            psd.symmetrize(0.1 * P + 0.2 * jnp.eye(D)))


def r3(P):
    with psd.latency_mode():
        e = mk_elem(P)
        out = assoc._combine_filter(e, e)
        return sum(jnp.sum(o * (0.1 + i)) for i, o in enumerate(out))


def r4(P):
    with psd.latency_mode():
        e = mk_elem(P)

        def sq(E, _):
            return assoc._combine_filter(E, E), None

        E, _ = jax.lax.scan(sq, e, None, length=12)
        return sum(jnp.sum(o * (0.1 + i)) for i, o in enumerate(E))


def r5(P):
    from temporalgps_tpu.ops import steady as sd
    from temporalgps_tpu.models.gauss_markov import GaussMarkov
    from temporalgps_tpu.models.lgssm import LGSSM
    from temporalgps_tpu.models import emissions as em
    from temporalgps_tpu.utils.fill import Fill
    from temporalgps_tpu.utils.gaussian import Gaussian

    N = 4096
    A = jnp.asarray(A5, jnp.float32)
    Pf = P.astype(jnp.float32)
    model = LGSSM(
        GaussMarkov(
            As=Fill(A, N), offs=Fill(0.01 * v0.astype(jnp.float32), N),
            Qs=Fill(psd.symmetrize(Pf * 0.1 + 0.05 * jnp.eye(D)), N),
            x0=Gaussian(jnp.zeros(D, jnp.float32), Pf),
            forward=True,
        ),
        em.ScalarEmissions(
            H=Fill(jnp.asarray(H5, jnp.float32), N),
            h=Fill(jnp.asarray(0.1, jnp.float32), N),
            s=Fill(jnp.asarray(0.1, jnp.float32), N),
        ),
    )
    ops = sd._steady_ops(model, jnp.float32, N, n_warmup=2048)
    out = 0.0
    for key in ("G", "K", "c_w"):
        out = out + jnp.sum(ops[key] * (0.3 + jnp.arange(ops[key].size,
                    dtype=ops[key].dtype).reshape(ops[key].shape) * 0.01))
    return out + ops["S"] * 0.3 + ops["logdetS"] * 0.7


def r6(P):
    from temporalgps_tpu.ops import steady as sd

    G = jnp.asarray(G6, jnp.float32) * (P[0, 0] / P[0, 0]).astype(
        jnp.float32
    )
    w = jnp.asarray(W6, jnp.float32) * P[0, 0].astype(jnp.float32)
    m0 = jnp.asarray(M6, jnp.float32)
    with jax.default_matmul_precision("highest"):
        out = sd.affine_const_states(G, w, m0, block_len=16)
    return jnp.sum(out * 1e-3)


def main():
    import os

    print("devices:", jax.devices(), flush=True)
    cpu = jax.local_devices(backend="cpu")[0]
    sel = os.environ.get("F64_REV_ONLY", "")
    cases = [("r0 chol", r0), ("r1 tri_solve", r1),
             ("r2 chol_solve", r2), ("r3 combine", r3),
             ("r4 scan-squarings", r4), ("r5 steady_ops", r5),
             ("r6 acs f32", r6)]
    if sel:
        cases = [c for c in cases if c[0].split()[0] in sel.split(",")]
    # Hypothesis (round 5): the 'highest' matmul-precision attribute breaks
    # XLA:TPU f64 emulation (NaN through the native chol/tri_solve custom
    # calls, silently-wrong numbers through the compact paths) — every
    # wrong-grad path runs under precision_ctx(D>4) = 'highest'; the clean
    # forward probes ran without it. Each case therefore runs under both.
    for prec in (None, "highest"):
        import contextlib

        ctx = (jax.default_matmul_precision("highest") if prec
               else contextlib.nullcontext())
        for name, fn in cases:
            t0 = time.perf_counter()
            tag = f"{name}{' HI' if prec else ''}"
            try:
                with ctx:
                    f = jax.jit(jax.grad(fn))
                    g_t = np.asarray(f(P0), np.float64)
                    with jax.default_device(cpu):
                        g_c = np.asarray(jax.jit(jax.grad(fn))(P0),
                                         np.float64)
                rel = float(np.max(np.abs(g_t - g_c) / (np.abs(g_c) + 1e-12)))
                print(f"[{tag}] ({time.perf_counter()-t0:.0f}s) "
                      f"rel={rel:.2e}", flush=True)
                if rel > 1e-6:
                    print(f"   tpu={g_t.ravel()[:6]}\n"
                          f"   cpu={g_c.ravel()[:6]}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[{tag}] RAISED {type(e).__name__}: {e}", flush=True)
    print("micro done", flush=True)


if __name__ == "__main__":
    main()
