"""Engine-only gradient gate for basis/steady on TPU.

Splits the c3 gradient into (model-build Jacobian) o (engine gradient):
the reduced model / basis columns / weight prior are built ON THE HOST CPU
(correctly-rounded f32 from true-f64 closed forms) together with their
per-hyperparameter tangents; the TPU computes only the ENGINE jvp on those
concrete inputs. This isolates the engine's TPU gradient quality from the
irreducible ~1-ulp cross-backend rounding of transcendentals in the model
build (XLA:TPU f64 emulation computes exp/cos/log at ~f32 grade —
probes/c3_head_bisect.py: per-step ~1e-6-grade noise saturating at 3e-4 in
head means), which the tiny d/dlog(s2) component amplifies to ~1.5e-3.

Run: PYTHONPATH=/root/repo:$PYTHONPATH \
  nohup python probes/c3_engine_gate.py > /tmp/c3_eng.log 2>&1 &
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
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.gp.lti_sde import basis_setup
from temporalgps_tpu.ops import basis as bops
from temporalgps_tpu.config import precision_ctx

dtype = jnp.float32
N, k = 4096, 2048
y_np = np.random.default_rng(0).standard_normal(N).astype(np.float32)


def build_inputs(p):
    """Model-build half: everything that depends on hyperparameters but not
    on the data path. Returns a pytree of f32 arrays (Fill model + basis
    columns + weight prior)."""
    s2, sc, noise = jnp.exp(p)
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    kern = (s2 * Matern52() + 0.6 * Matern32().stretch(sc)
            + 0.3 * ApproxPeriodic(0.5))
    fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
    return basis_setup(fx)


def engine_loss(inputs):
    model, M, P0 = inputs
    Y = jnp.concatenate([jnp.asarray(y_np, dtype)[:, None], M], axis=-1)
    w_off = jnp.zeros(M.shape[-1] + 1, dtype).at[0].set(1.0)
    with precision_ctx(model.latent_dim):
        ld, gram = bops.grams_steady(model, Y, w_off, n_warmup=k,
                                     fwd_mode=True)
        return bops.marginalised_lml(ld, gram, P0, N, dtype)


def main():
    print("devices:", jax.devices(), flush=True)
    cpu = jax.local_devices(backend="cpu")[0]
    p0 = jnp.log(jnp.asarray([1.0, 0.5, 0.1], dtype))

    # host side: inputs + per-hyperparameter tangents + the f64 oracle
    with jax.default_device(cpu):
        basis = []
        for i in range(3):
            e_i = jnp.zeros(3, dtype).at[i].set(1.0)
            inputs, din = jax.jit(
                lambda q, t: jax.jvp(build_inputs, (q,), (t,)))(p0, e_i)
            basis.append(din)

        def loss64(p):
            s2, sc, noise = jnp.exp(p)
            x64 = RegularSpacing(jnp.asarray(0.0, jnp.float64),
                                 jnp.asarray(0.001, jnp.float64), N)
            kern = (s2 * Matern52() + 0.6 * Matern32().stretch(sc)
                    + 0.3 * ApproxPeriodic(0.5))
            fx64 = to_sde(GP(kern), ArrayStorage(jnp.float64))(x64, noise)
            return api.logpdf(fx64, jnp.asarray(y_np, jnp.float64),
                              engine="basis", sub_engine="steady",
                              n_warmup=k, nan_fallback=False)

        g64 = np.asarray(jax.jit(jax.grad(loss64))(
            jnp.asarray(np.log([1.0, 0.5, 0.1]))))
    print(f"oracle g64={g64}", flush=True)

    # TPU side: engine jvp along each host tangent
    t0 = time.perf_counter()
    g_eng = []
    jvp_f = jax.jit(lambda x, t: jax.jvp(engine_loss, (x,), (t,))[1])
    for din in basis:
        g_eng.append(float(jvp_f(inputs, din)))
    g_eng = np.asarray(g_eng, np.float64)
    rel = float(np.max(np.abs(g_eng - g64) / (np.abs(g64) + 1e-9)))
    print(f"engine-gate grads ({time.perf_counter()-t0:.0f}s): {g_eng}",
          flush=True)
    print(f"engine-gate rel vs oracle: {rel:.2e}", flush=True)
    print("ENGINE GATE " + ("PASS" if rel < 1e-3 else "FAIL"), flush=True)


if __name__ == "__main__":
    main()
