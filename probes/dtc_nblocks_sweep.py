"""TPU probe: n_blocks sweep for the DTC block-engine logpdf at D=30.

_default_blocks caps B at 32 for D > 16 (conditioning + MXU-saturation
heuristic measured at D=150); the DTC state (M=10 x Matern52 -> D=30) is
better conditioned and much smaller — sweep to see where dispatch overhead
stops dominating.
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
from temporalgps_tpu.ops import block


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
    print(f"D={model.latent_dim}", flush=True)

    from temporalgps_tpu.models import lgssm as lg

    lp_seq = jax.jit(lambda y_: lg.logpdf(model, y_, engine="sequential"))
    dt, cs = timed(lp_seq, y_tf)
    v_seq = float(lp_seq(y_tf))
    print(
        f"seq logpdf: {dt*1e3:8.2f} ms compile {cs:.0f}s val={v_seq:.1f}",
        flush=True,
    )

    for b in [32, 128, 512, 2048]:
        f = jax.jit(lambda y_, b=b: block.logpdf(model, y_, n_blocks=b))
        dt, cs = timed(f, y_tf)
        v = float(f(y_tf))
        rel = abs(v - v_seq) / abs(v_seq)
        print(
            f"block logpdf B={b:5d}: {dt*1e3:8.2f} ms compile {cs:.0f}s "
            f"val={v:.1f} rel={rel:.1e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
