"""Microbenchmark: trailing-(D,D) batched layout vs lane-major unrolled
components for the per-step Kalman math. Run on TPU."""
# NOTE: this probe predates the amortised-timing methodology (see bench.py
# timed()); its block_until_ready-based numbers under-report sub-100ms
# runs on the tunneled backend. Kept as an investigation artifact.

import time

import jax
import jax.numpy as jnp
import numpy as np

B = 8192
L = 200
D = 3


def bench(fn, *args, iters=10):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((D, D)) * 0.1 + np.eye(D), jnp.float32)
    Q = jnp.asarray(np.eye(D) * 0.01, jnp.float32)
    H = jnp.asarray([1.0, 0, 0], jnp.float32)
    ys = jnp.asarray(rng.standard_normal((L, B)), jnp.float32)
    m0 = jnp.zeros((B, D), jnp.float32)
    P0 = jnp.broadcast_to(jnp.eye(D, dtype=jnp.float32), (B, D, D))

    @jax.jit
    def trailing(ys):
        def step(carry, y):
            m, P = carry
            m = jnp.einsum("ij,bj->bi", A, m)
            P = jnp.einsum("ij,bjk,lk->bil", A, P, A) + Q
            V = jnp.einsum("j,bjk->bk", H, P)
            S = jnp.einsum("bk,k->b", V, H) + 0.1
            K = V / S[:, None]
            resid = y - m[:, 0]
            m = m + K * resid[:, None]
            P = P - K[:, :, None] * V[:, None, :]
            return (m, P), None

        (m, P), _ = jax.lax.scan(step, (m0, P0), ys)
        return m

    # lane-major: components are (B,) vectors
    m0_c = tuple(m0[:, i] for i in range(D))
    P0_c = tuple(tuple(P0[:, i, j] for j in range(D)) for i in range(D))
    Ac = tuple(tuple(float(A[i, j]) for j in range(D)) for i in range(D))
    Qc = tuple(tuple(float(Q[i, j]) for j in range(D)) for i in range(D))

    @jax.jit
    def lanes(ys):
        def step(carry, y):
            m, P = carry
            m2 = tuple(sum(Ac[i][j] * m[j] for j in range(D)) for i in range(D))
            AP = tuple(
                tuple(sum(Ac[i][k] * P[k][j] for k in range(D)) for j in range(D))
                for i in range(D)
            )
            P2 = tuple(
                tuple(
                    sum(AP[i][k] * Ac[j][k] for k in range(D)) + Qc[i][j]
                    for j in range(D)
                )
                for i in range(D)
            )
            # H = e0
            V = tuple(P2[0][k] for k in range(D))
            S = V[0] + 0.1
            K = tuple(V[k] / S for k in range(D))
            resid = y - m2[0]
            m3 = tuple(m2[i] + K[i] * resid for i in range(D))
            P3 = tuple(
                tuple(P2[i][j] - K[i] * V[j] for j in range(D)) for i in range(D)
            )
            return (m3, P3), None

        (m, P), _ = jax.lax.scan(step, (m0_c, P0_c), ys)
        return m[0]

    t1 = bench(trailing, ys)
    t2 = bench(lanes, ys)
    print(f"trailing (B,D,D): {t1*1e3:8.3f} ms  ({L/t1*1e-3:8.1f} Ksteps/s scan)")
    print(f"lane-major comps: {t2*1e3:8.3f} ms  ({L/t2*1e-3:8.1f} Ksteps/s scan)")
    print(f"speedup: {t1/t2:.1f}x")


if __name__ == "__main__":
    main()
