"""TPU probe: phase-1 with PRE-MATERIALISED elements (combine-only scan)
vs the current fused construct+combine scan, DTC D=30 Nt=100k.
If combine-only is fast, the block engine should materialise elements
vectorised (one fat XLA region) and scan only the combine.
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
    M, Ns, Nt = 10, 50, 100_000
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

    F = tmaterialize(model.trans.As)
    c = tmaterialize(model.trans.offs)
    Q = tmaterialize(model.trans.Qs)
    emis_m = jax.tree.map(
        tmaterialize, model.emis, is_leaf=lambda l: hasattr(l, "value")
    )
    Hd, dd, s_diag = assoc._diag_emission_params(emis_m)

    for B in [2048, 512]:
        L = Nt // B

        def p1_combine_only(F_, c_, Q_, Hd_, dd_, sd_, y_, B=B, L=L):
            with jax.default_matmul_precision("highest"):
                elems = assoc.element_dense_diag(F_, c_, Q_, Hd_, dd_, sd_, y_)
                # (N, ...) -> (L, B, ...) blocked, scan combine only
                blocked = tuple(
                    jnp.swapaxes(
                        e[: B * L].reshape((B, L) + e.shape[1:]), 0, 1
                    )
                    for e in elems
                )

                def step(carry, sl):
                    return assoc._combine_filter(carry, sl), None

                ident = block._identity_element(B, D, dtype)
                agg, _ = jax.lax.scan(step, ident, blocked)
                return agg

        f = jax.jit(p1_combine_only)
        dt, cs = timed(f, F, c, Q, Hd, dd, s_diag, y_tf)
        print(
            f"phase1 combine-only B={B:5d}: {dt*1e3:8.2f} ms compile {cs:.0f}s",
            flush=True,
        )

        # elements+blocking alone (no scan), to separate the two costs
        def elems_blocked(F_, c_, Q_, Hd_, dd_, sd_, y_, B=B, L=L):
            with jax.default_matmul_precision("highest"):
                elems = assoc.element_dense_diag(F_, c_, Q_, Hd_, dd_, sd_, y_)
                return tuple(
                    jnp.swapaxes(
                        e[: B * L].reshape((B, L) + e.shape[1:]), 0, 1
                    )
                    for e in elems
                )

        f2 = jax.jit(elems_blocked)
        dt, cs = timed(f2, F, c, Q, Hd, dd, s_diag, y_tf)
        print(
            f"elems+block (no scan) B={B:5d}: {dt*1e3:8.2f} ms compile {cs:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
