"""TPU probe: decompose the DTC block-engine logpdf cost at D=30.

Times, separately jitted, under the same 'highest' precision scoping the
driver applies (models/lgssm._with_precision):
  elems   vectorized element construction over all N steps (no scan)
  phase1  within-block combine scan at several B
  phase3  within-block Kalman lml scan at several B
  full    lg.logpdf(engine="block", n_blocks=B)
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
from temporalgps_tpu.models import lgssm as lg
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
    print(f"D={D}", flush=True)

    # --- vectorized element construction over all N (no scan) ------------
    e = model.emis
    F = tmaterialize(model.trans.As)
    c = tmaterialize(model.trans.offs)
    Q = tmaterialize(model.trans.Qs)
    Hd, dd, s_diag = (
        tmaterialize(v) for v in assoc._diag_emission_params(
            jax.tree.map(tmaterialize, e, is_leaf=lambda l: hasattr(l, "value"))
        )
    )

    def elems_fn(F_, c_, Q_, Hd_, dd_, sd_, y_):
        # params passed as args: closed-over materialised (N,D,D) arrays
        # would be baked into the HLO as literals (remote compile HTTP 413)
        with jax.default_matmul_precision("highest"):
            return assoc.element_dense_diag(F_, c_, Q_, Hd_, dd_, sd_, y_)

    f = jax.jit(elems_fn)
    dt, cs = timed(f, F, c, Q, Hd, dd, s_diag, y_tf)
    print(f"elems vectorized (N={Nt}): {dt*1e3:8.2f} ms compile {cs:.0f}s", flush=True)

    # --- phase-1 combine scan at several B --------------------------------
    for B in [2048, 512]:
        def p1(y_, B=B):
            with jax.default_matmul_precision("highest"):
                L = Nt // B
                params = ((model.trans.As, model.trans.offs, model.trans.Qs), model.emis)
                blocked = block._split_tree((params, y_), B, L)
                return block._phase1_aggregates(blocked, B, D, dtype)

        f = jax.jit(p1)
        dt, cs = timed(f, y_tf)
        print(f"phase1 B={B:5d}: {dt*1e3:8.2f} ms compile {cs:.0f}s", flush=True)

    # --- full logpdf via the driver (precision-scoped) --------------------
    for B in [2048, 512]:
        f = jax.jit(lambda y_, B=B: lg.logpdf(model, y_, engine="block", n_blocks=B))
        dt, cs = timed(f, y_tf)
        v = float(f(y_tf))
        print(f"full block B={B:5d}: {dt*1e3:8.2f} ms compile {cs:.0f}s val={v:.1f}", flush=True)


if __name__ == "__main__":
    main()
