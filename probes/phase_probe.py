"""TPU probe: per-phase timing of the Pallas block logpdf at N=1M.

Times phase 1 (within-block element aggregation kernel), phase 2 (the XLA
associative_scan over B block aggregates), and phase 3 (within-block lml
kernel) separately, to size the win of fusing phase 2 into a single kernel
(docs/ROADMAP.md item 2).
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
from temporalgps_tpu.gp import GP, ArrayStorage, Matern52, to_sde
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.models import lgssm as lg
from temporalgps_tpu.ops import assoc, block
from temporalgps_tpu.ops import pallas_kernels as pk
from temporalgps_tpu.utils.gaussian import Gaussian


def timed(fn, *args, iters=20):
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
    N = 1_000_000
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    y = jax.device_put(
        np.random.default_rng(0).standard_normal(N).astype(np.float32)
    )
    fx = to_sde(GP(Matern52()), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    model = api.build_lgssm(fx)
    D = model.latent_dim

    # full pipeline reference
    lp = jax.jit(lambda y_: lg.logpdf(model, y_, engine="block"))
    dt, cs = timed(lp, y)
    print(f"full block logpdf: {dt*1e3:7.3f} ms (compile {cs:.0f}s)", flush=True)

    B = block._pallas_blocks(N)
    _p, y_p, s_p, n_pad, comp = block._pad_tail(model, y, B)
    L = (N + n_pad) // B
    y_main = y_p.reshape(B, L).T
    s_main = s_p.reshape(B, L).T
    t = model.trans
    packed = pk.pack_params(
        t.As.value, t.offs.value, t.Qs.value, model.emis.H.value,
        model.emis.h.value, dtype,
    )
    print(f"B={B} L={L} n_pad={n_pad}", flush=True)

    ph1 = jax.jit(lambda ym, sm: pk.phase1_aggregate(ym, sm, packed, D))
    dt1, cs = timed(ph1, y_main, s_main)
    print(f"phase1 kernel:     {dt1*1e3:7.3f} ms (compile {cs:.0f}s)", flush=True)

    comps = ph1(y_main, s_main)
    DD = D * D

    def unpack_and_scan(comps_):
        A_e = comps_[:DD].T.reshape(B, D, D)
        b_e = comps_[DD : DD + D].T
        C_e = comps_[DD + D : 2 * DD + D].T.reshape(B, D, D)
        eta_e = comps_[2 * DD + D : 2 * DD + 2 * D].T
        J_e = comps_[2 * DD + 2 * D :].T.reshape(B, D, D)
        prior = block._prior_element(model.trans.x0, D, dtype)
        elems = tuple(
            jnp.concatenate([p, a], axis=0)
            for p, a in zip(prior, (A_e, b_e, C_e, eta_e, J_e))
        )
        pref = jax.lax.associative_scan(assoc._combine_filter, elems, axis=0)
        return jnp.concatenate(
            [pref[1][:-1].T, pref[2][:-1].reshape(B, DD).T], axis=0
        )

    ph2 = jax.jit(unpack_and_scan)
    dt2, cs = timed(ph2, comps)
    print(f"phase2 (XLA scan): {dt2*1e3:7.3f} ms (compile {cs:.0f}s)", flush=True)

    starts_comp = ph2(comps)
    ph3 = jax.jit(lambda ym, sm, st: jnp.sum(pk.phase3_lml(ym, sm, packed, st, D)))
    dt3, cs = timed(ph3, y_main, s_main, starts_comp)
    print(f"phase3 kernel:     {dt3*1e3:7.3f} ms (compile {cs:.0f}s)", flush=True)
    print(
        f"sum of phases:     {(dt1+dt2+dt3)*1e3:7.3f} ms  "
        f"(full-pipeline overhead = {dt*1e3 - (dt1+dt2+dt3)*1e3:.3f} ms)",
        flush=True,
    )


if __name__ == "__main__":
    main()
