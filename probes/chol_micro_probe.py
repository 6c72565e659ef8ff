"""TPU micro-probe: batched small-matrix Cholesky / triangular-solve cost.

Hypothesis: XLA-TPU's cholesky/triangular_solve lowering for (N, 30, 30)
batches is orders off speed-of-light; an unrolled column-loop (pure
elementwise/VPU ops) should be ~HBM-bound. All outputs forced via scalars.
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


def timed(fn, *args, iters=5):
    """block_until_ready does NOT force execution on the tunneled backend
    (measured: sync sum of 360MB reports 0.04 ms) — fetch the scalar to host
    every iteration; subtract the round-trip floor measured separately."""
    t0 = time.perf_counter()
    float(fn(*args))
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    return (time.perf_counter() - t0) / iters, cs


def chol_unrolled(A, D):
    """Column-by-column Cholesky, batched; D compile-time."""
    R = A
    cols = []
    for j in range(D):
        d = jnp.sqrt(R[..., j, j])
        col = R[..., :, j] / d[..., None]
        keep = (jnp.arange(D) >= j)
        col = jnp.where(keep, col, 0.0)
        cols.append(col)
        R = R - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)


def tri_inv_unrolled(L, D):
    """L^{-1} for lower-triangular L, batched, forward substitution."""
    cols = []
    for j in range(D):
        e = jnp.zeros(L.shape[:-2] + (D,), L.dtype).at[..., j].set(1.0)
        x = e
        # forward substitution: x_i = (e_i - sum_{k<i} L[i,k] x_k) / L[i,i]
        xs = []
        for i in range(D):
            acc = e[..., i]
            if i:
                acc = acc - jnp.einsum(
                    "...k,...k->...", L[..., i, :i], jnp.stack(xs, axis=-1)
                )
            xs.append(acc / L[..., i, i])
        cols.append(jnp.stack(xs, axis=-1))
    return jnp.stack(cols, axis=-1)


def main():
    print(jax.devices(), flush=True)
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    N, D = 100_000, 30
    X = jnp.asarray(rng.standard_normal((N, D, D)).astype(np.float32))
    A = X @ jnp.swapaxes(X, -1, -2) + 10.0 * jnp.eye(D, dtype=dtype)
    Bm = jnp.asarray(rng.standard_normal((N, D, D)).astype(np.float32))

    f1 = jax.jit(lambda A_: jnp.sum(jnp.linalg.cholesky(A_)))
    dt, cs = timed(f1, A)
    print(f"xla cholesky (N={N}, D={D}): {dt*1e3:8.2f} ms compile {cs:.0f}s", flush=True)

    f2 = jax.jit(lambda A_: jnp.sum(chol_unrolled(A_, D)))
    dt, cs = timed(f2, A)
    print(f"unrolled chol: {dt*1e3:8.2f} ms compile {cs:.0f}s", flush=True)

    L = jnp.linalg.cholesky(A)
    f3 = jax.jit(lambda L_, B_: jnp.sum(
        jax.scipy.linalg.solve_triangular(L_, B_, lower=True)
    ))
    dt, cs = timed(f3, L, Bm)
    print(f"xla tri_solve (D,D rhs): {dt*1e3:8.2f} ms compile {cs:.0f}s", flush=True)

    f4 = jax.jit(lambda L_, B_: jnp.sum(tri_inv_unrolled(L_, D) @ B_))
    dt, cs = timed(f4, L, Bm)
    print(f"unrolled tri_inv + matmul: {dt*1e3:8.2f} ms compile {cs:.0f}s", flush=True)

    # accuracy
    L_u = jax.jit(lambda A_: chol_unrolled(A_, D))(A)
    print("chol maxerr:", float(jnp.max(jnp.abs(L_u - L))), flush=True)
    Li = jax.jit(lambda L_: tri_inv_unrolled(L_, D))(L)
    err = jnp.max(jnp.abs(Li @ L - jnp.eye(D, dtype=dtype)))
    print("tri_inv maxerr(LiL-I):", float(err), flush=True)

    # batched matmul reference (the op everything should reduce to)
    f5 = jax.jit(lambda X_, Y_: jnp.sum(X_ @ Y_))
    dt, cs = timed(f5, A, Bm)
    print(f"batched matmul (N,{D},{D}): {dt*1e3:8.2f} ms compile {cs:.0f}s", flush=True)


if __name__ == "__main__":
    main()
