"""Stage-2 bisect of the TPU f64 grams_block NaN (see c3_nan_bisect.py).

Stage 1 established: the basis/steady VALUE and grad NaN at
(N=4096, k=2048) comes from the f64-emulated warmup head (grams_block on
the f64-cast reduced model); an f32 head is finite (but its grads are
wrong), and the same head at k=2688/N=1M passed the round-4 value gate.

This probe bisects INSIDE the f64 head, values only (cheap compiles):

  s0  grams_sequential f64 @ k=2048 — the plain lax.scan ground truth.
      NaN here => an f64-op emulation bug independent of the block schedule.
  s1  grams_block f64 @ k=2048, B_w in {16, 64, 128} — schedule dependence.
  s2  grams_block f64 @ k=2688, B_w=64 — the shape that passed at N=1M.
  s3  phase bisect @ k=2048, B_w=64: phase-1 aggregates, phase-2 prefix
      starts, and phase-3 outputs, each fetched and finite-checked.

Run: cd /root/repo && PYTHONPATH=/root/repo:$PYTHONPATH \
  nohup python probes/c3_nan_bisect2.py > /tmp/c3_bisect2.log 2>&1 &
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
from temporalgps_tpu.ops import assoc, basis as basis_ops, block as block_ops
from temporalgps_tpu.ops import steady as sd
from temporalgps_tpu.utils import psd
from temporalgps_tpu.utils.fill import scan_emit
from temporalgps_tpu.models import emissions as em

dtype = jnp.float32
N = 4_096


def finite_map(tree):
    return jax.tree_util.tree_map(
        lambda l: bool(np.isfinite(np.asarray(l)).all()), tree
    )


def run(name, fn, *args):
    t0 = time.perf_counter()
    try:
        out = fn(*args)
        fm = finite_map(out)
        print(f"[{name}] ({time.perf_counter()-t0:.0f}s) finite={fm}",
              flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] ({time.perf_counter()-t0:.0f}s) RAISED {e!r}",
              flush=True)
        return None


def main():
    print("devices:", jax.devices(), flush=True)
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    p0 = jnp.log(jnp.asarray([1.0, 0.5, 0.1], dtype))

    def make_fx(p):
        s2, sc, noise = jnp.exp(p)
        kern = (
            s2 * Matern52()
            + 0.6 * Matern32().stretch(sc)
            + 0.3 * ApproxPeriodic(0.5)
        )
        return to_sde(GP(kern), ArrayStorage(dtype))(x, noise)

    model, M, P0 = basis_setup(make_fx(p0))
    y = jax.device_put(
        np.random.default_rng(0).standard_normal(1_000_000).astype(np.float32)
    )[:N]
    Y = jnp.concatenate([y[:, None], M], axis=-1)
    R = Y.shape[-1]
    w_off = jnp.zeros(R, dtype).at[0].set(1.0)
    hi = jnp.float64

    def head(k, B_w, which):
        mdl = basis_ops._astype_tree(sd._trim(model, k), hi)
        Yk = Y[:k].astype(hi)
        wk = w_off.astype(hi)
        if which == "seq":
            return basis_ops.grams_sequential(mdl, Yk, wk)
        return basis_ops.grams_block(mdl, Yk, wk, n_blocks=B_w,
                                     final_state=True)

    run("s0 seq f64 k=2048", jax.jit(lambda: head(2048, None, "seq")))
    for bw in (16, 64, 128):
        run(f"s1 block f64 k=2048 B={bw}",
            jax.jit(lambda bw=bw: head(2048, bw, "block")))
    run("s2 block f64 k=2688 B=64", jax.jit(lambda: head(2688, 64, "block")))

    # s3: phase bisect at k=2048, B_w=64 — re-create grams_block's internals.
    def phases(k=2048, B=64):
        mdl = basis_ops._astype_tree(sd._trim(model, k), hi)
        Yk = Y[:k].astype(hi)
        wk = w_off.astype(hi)
        t = mdl.trans
        D = mdl.latent_dim
        params_p, Y_p, _, n_pad, _ = block_ops._pad_tail(mdl, Yk, B)
        L = (k + n_pad) // B
        blocked = block_ops._split_tree((params_p, Y_p), B, L)

        def phase1_step(carry, sl):
            elem = basis_ops._step_element_multi(sl, wk, D, hi)
            return None, basis_ops._combine_filter_multi(carry, elem)

        _, agg = scan_emit(
            phase1_step, blocked,
            basis_ops._identity_element_multi(B, D, R, hi),
        )
        prior = (
            jnp.zeros((1, D, D), hi),
            (t.x0.mean[:, None] * wk)[None].astype(hi),
            psd.symmetrize(t.x0.cov)[None].astype(hi),
            jnp.zeros((1, D, R), hi),
            jnp.zeros((1, D, D), hi),
        )
        elems = tuple(
            jnp.concatenate([p, a], axis=0) for p, a in zip(prior, agg)
        )
        pref = jax.lax.associative_scan(
            basis_ops._combine_filter_multi, elems, axis=0
        )
        return agg, pref

    out = run("s3 phases k=2048 B=64", jax.jit(phases))
    if out is not None:
        agg, pref = out
        for nm, tr in (("agg(A,b,C,eta,J)", agg), ("pref", pref)):
            flags = [bool(np.isfinite(np.asarray(l)).all()) for l in tr]
            print(f"  {nm}: {flags}", flush=True)
            if not all(flags):
                for i, l in enumerate(tr):
                    a = np.asarray(l)
                    bad = ~np.isfinite(a)
                    if bad.any():
                        idx = np.argwhere(bad)[0]
                        print(f"    comp {i}: first bad at {idx}, "
                              f"n_bad={int(bad.sum())}/{a.size}", flush=True)
    print("bisect2 done", flush=True)


if __name__ == "__main__":
    main()
