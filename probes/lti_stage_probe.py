"""Stage breakdown of the lti scalar pipeline at the c3 shape (D=19, N=1M)
plus layout micro-benchmarks for the planned component-major (cm) rewrite
(docs/ROADMAP.md item 2c / VERDICT round-2 item 5).

Hypothesis: the pipeline is HBM-bandwidth-bound and row layout (N, D, D)
pays tile padding — TPU pads the two minor dims to (8, 128), so a
(1e6, 19, 19) f32 tensor occupies 24x128/19x19 = 8.5x its dense bytes.
Component-major (D, D, N) keeps N minor (dense lanes).

Stages timed (amortised, fetch-last-scalar — see bench.timed):
  s1  full lti.logpdf
  s2  _cov_pass only
  s3  gain pipeline (cov pass + Sv/K/G/w math)
  s4  affine_prefix_states on precomputed (G, w)
Micros:
  m1  row-layout elementwise symmetrize(P)+P sum vs cm layout
  m2  batched matmul row (N,D,D)@(N,D,D) vs cm k-loop 'ikn,kjn->ijn'
  m3  const-left matmul A0 @ P: row einsum vs cm fat-MXU reshape
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

D, N = 19, 1_000_000
DT = jnp.float32

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
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    dt = max((time.perf_counter() - t0 - fl) / iters, 1e-9)
    print(f"{name}: {dt*1e3:.2f} ms (compile {cs:.0f}s)", flush=True)
    return dt


def model_c3_like():
    from temporalgps_tpu import RegularSpacing
    from temporalgps_tpu.gp import (GP, ApproxPeriodic, ArrayStorage,
                                    Matern12, Matern52, to_sde)
    from temporalgps_tpu.gp import lti_sde as api

    k = (
        Matern52().stretch(0.8) * 2.0
        + Matern12().stretch(4.0) * 0.5
        + ApproxPeriodic(3, period=1.0).stretch(1.2) * 1.0
    )
    x = RegularSpacing(jnp.asarray(0.0, DT), jnp.asarray(1e-2, DT), N)
    fx = to_sde(GP(k), ArrayStorage(DT))(x, jnp.asarray(0.3, DT))
    return api.build_lgssm(fx)


def main():
    print(jax.devices(), flush=True)
    from temporalgps_tpu.models import lgssm as lg
    from temporalgps_tpu.ops import block as blk
    from temporalgps_tpu.ops import lti
    from temporalgps_tpu.utils import psd

    model = model_c3_like()
    Dm = model.latent_dim
    print(f"model latent_dim={Dm}", flush=True)
    y = jnp.asarray(np.random.default_rng(0).standard_normal(N), DT)

    # ---- stages --------------------------------------------------------
    f1 = jax.jit(lambda y_: lti.logpdf(model, y_))
    timed("s1 lti.logpdf", f1, y)

    B = min(blk._default_blocks(N, 1), N)
    while N % B:
        B //= 2

    def covp(y_):
        P_f, _, _, _ = lti._cov_pass(model, N, B, DT)
        return jnp.sum(P_f[-1])

    timed("s2 _cov_pass", jax.jit(covp), y)

    def gains(y_):
        q = lti._filter_pass.__wrapped__(model, y_, B) if hasattr(
            lti._filter_pass, "__wrapped__") else None
        return q

    # inline the gain math (scalar path) to stop before the affine solve
    def gainmath(y_):
        x0 = model.trans.x0
        P_f, e0, (A0, a0, Q0), e_single = lti._cov_pass(model, N, B, DT)
        P_prev = jnp.concatenate(
            [psd.symmetrize(x0.cov)[None].astype(DT), P_f[:-1]], axis=0)
        P_pred = psd.symmetrize(A0 @ P_prev @ A0.T + Q0)
        H, h, s = e_single.H, e_single.h, e_single.s
        Sv = jnp.einsum("i,nij,j->n", H, P_pred, H) + s
        PH = jnp.einsum("nij,j->ni", P_pred, H)
        K = PH / Sv[:, None]
        G = A0 - K[:, :, None] * (H @ A0)[None, None, :]
        w = (a0[None] - K * (H @ a0)) + K * (y_ - h)[:, None]
        return jnp.sum(G[-1]) + jnp.sum(w[-1]) + jnp.sum(Sv[-1])

    timed("s3 cov+gains", jax.jit(gainmath), y)

    # s4: affine prefix on materialised G, w
    key = jax.random.PRNGKey(0)
    G0 = 0.9 * jnp.eye(Dm, dtype=DT)[None] + 0.001 * jax.random.normal(
        key, (N, Dm, Dm), DT)
    w0 = 0.01 * jax.random.normal(key, (N, Dm), DT)
    m0 = jnp.zeros((Dm,), DT)

    def aff(G_, w_):
        st = blk.affine_prefix_states(G_, w_, None, m0, None, n_blocks=B)
        return jnp.sum(st.mean[-1])

    timed("s4 affine_prefix", jax.jit(aff), G0, w0)

    # ---- layout micros --------------------------------------------------
    P_row = jnp.asarray(
        np.random.default_rng(1).standard_normal((N, Dm, Dm)), DT)
    P_cm = jnp.ascontiguousarray(jnp.moveaxis(P_row, 0, -1))
    A0c = jnp.asarray(np.random.default_rng(2).standard_normal((Dm, Dm)), DT)

    timed("m1 row sym+sum", jax.jit(
        lambda P: jnp.sum(0.5 * (P + jnp.swapaxes(P, -1, -2)) + P)), P_row)
    timed("m1 cm  sym+sum", jax.jit(
        lambda P: jnp.sum(0.5 * (P + jnp.swapaxes(P, 0, 1)) + P)), P_cm)

    timed("m2 row bmm", jax.jit(lambda P: jnp.sum((P @ P)[:, 0, 0])), P_row)

    def cm_mm(A, Bm):
        out = A[:, 0, None, :] * Bm[None, 0, :, :]
        for k in range(1, Dm):
            out = out + A[:, k, None, :] * Bm[None, k, :, :]
        return out

    timed("m2 cm  kloop", jax.jit(lambda P: jnp.sum(cm_mm(P, P)[0, 0])), P_cm)

    timed("m3 row constL", jax.jit(
        lambda P: jnp.sum(jnp.einsum("ik,nkj->nij", A0c, P)[:, 0, 0])), P_row)
    timed("m3 cm  constL", jax.jit(
        lambda P: jnp.sum((A0c @ P.reshape(Dm, -1)).reshape(Dm, Dm, N)[0, 0])),
        P_cm)
    # sandwich A P A' in cm via two constL + leading swap (P symmetric)
    def cm_sandwich(P):
        T1 = (A0c @ P.reshape(Dm, -1)).reshape(Dm, Dm, N)  # A P
        T1s = jnp.swapaxes(T1, 0, 1)                        # (A P)' = P A'
        return (A0c @ T1s.reshape(Dm, -1)).reshape(Dm, Dm, N)  # A P A'
    timed("m3 cm  sandwich", jax.jit(lambda P: jnp.sum(cm_sandwich(P)[0, 0])), P_cm)
    timed("m3 row sandwich", jax.jit(
        lambda P: jnp.sum((A0c @ P @ A0c.T)[:, 0, 0])), P_row)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
