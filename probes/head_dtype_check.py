"""Accuracy of basis/steady grams vs head dtype AND warmup tolerance
(CPU, f64 sequential oracle).

The exact warmup head is the dominant TPU cost of the c3 basis/steady path
(probes/grams_steady_dissect.py: 394-618 ms of the ~412 ms logpdf; ~96 ms
if f32). Two knobs trade head cost for accuracy:

  * head_dtype — f32 vs the default hi (f64): head-state error decays
    geometrically under the steady gain, but the head GRAM accumulates the
    f32 innovation round-off over k steps; measure, don't assume.
  * warmup tolerance — suggest_warmup(tol): the constant-gain switch error
    is N-independent (gain deviation ~tol at step k, decaying
    geometrically), so a looser tol (smaller k) is plausibly free. This
    sweep is the measurement the bench c3 warmup choice (tol=1e-2) cites.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python probes/head_dtype_check.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import (GP, ApproxPeriodic, ArrayStorage, Matern32,
                                Matern52, to_sde)
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.gp.lti_sde import basis_setup
from temporalgps_tpu.ops import steady

p0 = jnp.log(jnp.asarray([1.0, 0.5, 0.1], jnp.float64))

for N in (20_000, 100_000):
    y_np = np.random.default_rng(0).standard_normal(N)

    def loss(p, dtype, engine, **kw):
        s2, sc, noise = jnp.exp(p.astype(dtype))
        x = RegularSpacing(
            jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N
        )
        kern = (
            s2 * Matern52()
            + 0.6 * Matern32().stretch(sc)
            + 0.3 * ApproxPeriodic(0.5)
        )
        fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
        return api.logpdf(fx, jnp.asarray(y_np, dtype), engine=engine, **kw)

    x32 = RegularSpacing(jnp.asarray(0.0, jnp.float32),
                         jnp.asarray(0.001, jnp.float32), N)
    fx32 = to_sde(GP(Matern52() + 0.6 * Matern32().stretch(0.5)
                     + 0.3 * ApproxPeriodic(0.5)),
                  ArrayStorage(jnp.float32))(x32, 0.1)
    model32 = basis_setup(fx32)[0]

    oracle = jax.jit(jax.value_and_grad(
        lambda p: loss(p, jnp.float64, "sequential")))
    v64, g64 = oracle(p0)
    v64, g64 = float(v64), np.asarray(g64)
    print(f"\nN={N}  f64 sequential oracle: v={v64:.8f} g={g64}")

    for tol in (1e-2, 1e-6):
        k = int(steady.suggest_warmup(model32, tol=tol))
        for name, kw in [
            ("f64 head", {}),
            ("f32 head", {"head_dtype": jnp.float32}),
        ]:
            f = jax.jit(jax.value_and_grad(
                lambda p: loss(p, jnp.float32, "basis", sub_engine="steady",
                               n_warmup=k, **kw)))
            v, g = f(p0.astype(jnp.float32))
            v, g = float(v), np.asarray(g)
            rel_v = abs(v - v64) / abs(v64)
            rel_g = float(np.max(np.abs(g - g64) / (np.abs(g64) + 1e-9)))
            print(f"  tol={tol:.0e} k={k:5d} {name}: "
                  f"rel_v={rel_v:.2e} rel_g={rel_g:.2e} g={g}")
