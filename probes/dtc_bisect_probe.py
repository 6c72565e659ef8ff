"""TPU probe: bisect the DTC phase-1 cost (D=30, Nt=100k, B=2048).

Variants, all separately jitted in ONE process (compile-service friendly):
  v0 full      construct+combine in-scan (current engine path)
  v1 combine   pre-materialised elements, scan only the combine
  v2 construct in-scan element construction, combine replaced by last-elem
  v3 nochol    v2 but Cholesky/tri-solve replaced by plain matmuls of the
               same shapes (isolates the chol/solve lowering cost)
  v4 elems     vectorised construction over all N, summed (forces compute)
All under 'highest' matmul precision (the driver's scoping for D=30).
"""
# NOTE: this probe predates the amortised-timing methodology (see bench.py
# timed()); its block_until_ready-based numbers under-report sub-100ms
# runs on the tunneled backend. Kept as an investigation artifact.

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
from temporalgps_tpu.gp import EQ, GP, ArrayStorage, Matern52, to_sde
from temporalgps_tpu.gp.lti_sde import build_lgssm
from temporalgps_tpu.space_time import RectilinearGrid, Separable
from temporalgps_tpu.space_time.pseudo_point import dtcify
from temporalgps_tpu.ops import assoc, block
from temporalgps_tpu.utils import psd
from temporalgps_tpu.utils.fill import tmaterialize


def timed(fn, *args, iters=5):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, cs


def main():
    print(jax.devices(), flush=True)
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    M, Ns, Nt, B = 10, 50, 100_000, 2048
    L = Nt // B
    r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
    z = jnp.asarray(np.linspace(-3, 3, M), dtype)
    x = RectilinearGrid(
        r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt)
    )
    kern = Separable(EQ().stretch(0.7), Matern52())
    fx = to_sde(GP(kern), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    model = build_lgssm(dtcify(z, fx))
    y_tf = jnp.asarray(rng.standard_normal((Nt, Ns)), dtype)
    D = model.latent_dim
    print(f"D={D} B={B} L={L}", flush=True)

    F = tmaterialize(model.trans.As)
    c = tmaterialize(model.trans.offs)
    Q = tmaterialize(model.trans.Qs)
    emis_m = jax.tree.map(
        tmaterialize, model.emis, is_leaf=lambda l: hasattr(l, "value")
    )
    Hd, dd, s_diag = assoc._diag_emission_params(emis_m)
    hp = jax.default_matmul_precision

    def blocked(e):
        return jnp.swapaxes(e[: B * L].reshape((B, L) + e.shape[1:]), 0, 1)

    # v0: current engine phase-1 (construct+combine in-scan)
    def v0(y_):
        with hp("highest"):
            params = ((model.trans.As, model.trans.offs, model.trans.Qs), model.emis)
            blk = block._split_tree((params, y_), B, L)
            return block._phase1_aggregates(blk, B, D, dtype)

    # v1: combine-only over pre-materialised elements
    def v1(F_, c_, Q_, Hd_, dd_, sd_, y_):
        with hp("highest"):
            elems = assoc.element_dense_diag(F_, c_, Q_, Hd_, dd_, sd_, y_)
            blk = tuple(blocked(e) for e in elems)

            def step(carry, sl):
                return assoc._combine_filter(carry, sl), None

            agg, _ = jax.lax.scan(step, block._identity_element(B, D, dtype), blk)
            return agg

    # v2: construct-only in-scan (keep last element as carry; no combine)
    def v2(F_, c_, Q_, Hd_, dd_, sd_, y_):
        with hp("highest"):
            blk = tuple(
                blocked(e) for e in (F_, c_, Q_)
            ) + tuple(blocked(e) for e in (Hd_, dd_, sd_)) + (blocked(y_),)

            def step(carry, sl):
                Fb, cb, Qb, Hb, db, sb, yb = sl
                e = assoc.element_dense_diag(Fb, cb, Qb, Hb, db, sb, yb)
                return e, None

            ident = block._identity_element(B, D, dtype)
            e, _ = jax.lax.scan(step, ident, blk)
            return e

    # v3: construct-only but chol/tri_solve/chol_solve swapped for matmuls
    def v3(F_, c_, Q_, Hd_, dd_, sd_, y_):
        with hp("highest"):
            blk = tuple(
                blocked(e) for e in (F_, c_, Q_)
            ) + tuple(blocked(e) for e in (Hd_, dd_, sd_)) + (blocked(y_),)
            I = jnp.eye(D, dtype=dtype)

            def step(carry, sl):
                Fb, cb, Qb, Hb, db, sb, yb = sl
                q_isqrt = 1.0 / jnp.sqrt(sb)
                Hw = Hb * q_isqrt[..., None]
                delta = q_isqrt * (yb - (jnp.einsum("...ij,...j->...i", Hb, cb) + db))
                Gram = psd.symmetrize(jnp.swapaxes(Hw, -1, -2) @ Hw)
                u = jnp.einsum("...ji,...j->...i", Hw, delta)
                Lp = Qb + I  # stand-in for cholesky
                T = jnp.swapaxes(Lp, -1, -2) @ Gram
                Fm = psd.symmetrize(T @ Lp) + I
                Lf = Fm + I  # stand-in for cholesky
                G = Lf @ jnp.swapaxes(Lp, -1, -2)  # stand-in for tri_solve
                C_e = jnp.swapaxes(G, -1, -2) @ G
                Lpu = jnp.einsum("...ji,...j->...i", Lp, u)
                FmiLpu = jnp.einsum("...ij,...j->...i", Lf, Lpu)  # stand-in
                b_e = cb + jnp.einsum("...ij,...j->...i", Lp, FmiLpu)
                M1 = psd.symmetrize(Gram - jnp.swapaxes(T, -1, -2) @ (Lf @ T))
                A_e = Fb - psd.symmetrize(Qb) @ (M1 @ Fb)
                w = u - jnp.einsum("...ji,...j->...i", T, FmiLpu)
                eta_e = jnp.einsum("...ji,...j->...i", Fb, w)
                J_e = psd.symmetrize(jnp.swapaxes(Fb, -1, -2) @ M1 @ Fb)
                return (A_e, b_e, C_e, eta_e, J_e), None

            ident = block._identity_element(B, D, dtype)
            e, _ = jax.lax.scan(step, ident, blk)
            return e

    # v4: vectorised construction over all N, reduced (forces the compute)
    def v4(F_, c_, Q_, Hd_, dd_, sd_, y_):
        with hp("highest"):
            elems = assoc.element_dense_diag(F_, c_, Q_, Hd_, dd_, sd_, y_)
            return sum(jnp.sum(e) for e in elems)

    args_m = (F, c, Q, Hd, dd, s_diag, y_tf)
    for name, fn, args in [
        ("v0 full     ", v0, (y_tf,)),
        ("v1 combine  ", v1, args_m),
        ("v2 construct", v2, args_m),
        ("v3 nochol   ", v3, args_m),
        ("v4 elems-sum", v4, args_m),
    ]:
        f = jax.jit(fn)
        dt, cs = timed(f, *args)
        print(f"{name}: {dt*1e3:8.2f} ms compile {cs:.0f}s", flush=True)


if __name__ == "__main__":
    main()
