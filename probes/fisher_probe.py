"""Fisher-identity gradients at spec scale (VERDICT round-2 item 3 done
criterion): k=10 hyperparameters, N=1M, f32 — lp+grad must cost <= ~2x a
forward pass and match the (1+k)-scaling fwd-mode path where that path can
even compile (its k=10 N=1M graph has OOM-killed the remote compile
helper twice).

Sections:
  A. forward logpdf baselines (block engine) for the k=10 model (D=12)
  B. value_and_grad_fisher (engine='parallel' and 'block') timing + one
     k=3 accuracy cross-check vs the fused fwd-mode path
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

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import GP, ArrayStorage, Matern12, Matern32, Matern52, to_sde
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.learning import value_and_grad_fisher
from temporalgps_tpu.models import lgssm as lg

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


def timed(name, fn, *args, iters=10):
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


def main():
    print(jax.devices(), flush=True)
    DT = jnp.float32
    N = 1_000_000
    x = RegularSpacing(jnp.asarray(0.0, DT), jnp.asarray(1e-2, DT), N)
    y = jnp.asarray(np.random.default_rng(0).standard_normal(N), DT)

    def model_fn(p):
        kern = (
            (jnp.exp(p[0]) * Matern52()).stretch(jnp.exp(p[1]))
            + (jnp.exp(p[2]) * Matern32()).stretch(jnp.exp(p[3]))
            + (jnp.exp(p[4]) * Matern12()).stretch(jnp.exp(p[5]))
            + (jnp.exp(p[6]) * Matern52()).stretch(jnp.exp(p[7]))
            + (jnp.exp(p[8]) * Matern32()).stretch(jnp.exp(p[9]))
        )
        fx = to_sde(GP(kern), ArrayStorage(DT))(x, jnp.asarray(0.3, DT))
        return api.build_lgssm(fx)

    p0 = jnp.asarray(
        [0.1, -0.2, 0.0, 0.4, -0.3, 0.2, 0.15, -0.1, 0.05, 0.3], DT)
    m0 = model_fn(p0)
    print(f"k=10 model latent_dim={m0.latent_dim}", flush=True)

    # A: forward baselines
    d_fwd = timed("A fwd logpdf [block]",
                  jax.jit(lambda p: lg.logpdf(model_fn(p), y,
                                              engine="block", pallas=False)),
                  p0)
    timed("A fwd logpdf [lti(cm)]",
          jax.jit(lambda p: lg.logpdf(model_fn(p), y, engine="lti")), p0)

    # B: fisher lp+grad, k-independent
    for eng in ("parallel", "block"):
        try:
            vg = value_and_grad_fisher(model_fn, y, engine=eng)
            d_g = timed(f"B fisher lp+grad(10) [{eng}]", jax.jit(vg), p0)
            print(f"   ratio grad/fwd = {d_g/d_fwd:.2f}x", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"B [{eng}] failed: {type(e).__name__}: {e}", flush=True)

    # C: accuracy cross-check at N=100k (cheap): fisher vs fused fwd JVP k=3
    N2 = 100_000
    x2 = RegularSpacing(jnp.asarray(0.0, DT), jnp.asarray(1e-2, DT), N2)
    y2 = y[:N2]

    def model3(p):
        fx = to_sde(GP((jnp.exp(p[0]) * Matern52()).stretch(jnp.exp(p[1]))),
                    ArrayStorage(DT))(x2, jnp.exp(p[2]))
        return api.build_lgssm(fx)

    from temporalgps_tpu.learning import value_and_grad_fwd_lgssm

    p3 = jnp.asarray([0.1, -0.2, -1.0], DT)
    v_f, g_f = jax.jit(value_and_grad_fisher(model3, y2))(p3)
    v_a, g_a = jax.jit(value_and_grad_fwd_lgssm(model3, y2))(p3)
    g_f, g_a = np.asarray(g_f), np.asarray(g_a)
    rel = np.max(np.abs(g_f - g_a) / (np.abs(g_a) + 1e-6))
    print(f"C k=3 N=100k: fisher vs fused-fwd grad rel={rel:.2e} "
          f"(v rel={abs(float(v_f)-float(v_a))/abs(float(v_a)):.2e})",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
