"""CPU f64 validation of ops/basis.grams_steady: value + reverse-mode grad
vs the exact block/sequential grams engines at the bench-c3 kernel family.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python probes/basis_steady_check.py
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

dtype = jnp.float64
N = 3000
x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), N)
y = jnp.asarray(np.random.default_rng(0).standard_normal(N), dtype)


def loss(p, engine, **kw):
    s2, sc, noise = jnp.exp(p)
    kern = s2 * Matern52() + 0.6 * Matern32().stretch(sc) + 0.3 * ApproxPeriodic(0.5)
    fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
    return api.logpdf(fx, y, engine=engine, **kw)


p0 = jnp.zeros(3, dtype)

v_seq = float(jax.jit(lambda p: loss(p, "sequential"))(p0))
v_blk = float(jax.jit(lambda p: loss(p, "basis", sub_engine="block"))(p0))
v_std = float(
    jax.jit(lambda p: loss(p, "basis", sub_engine="steady", n_warmup=512))(p0)
)
print(f"value: seq={v_seq:.10f} basis-block={v_blk:.10f} basis-steady={v_std:.10f}")
print(f"  rel(block vs seq)={abs(v_blk-v_seq)/abs(v_seq):.2e}")
print(f"  rel(steady vs seq)={abs(v_std-v_seq)/abs(v_seq):.2e}")

g_seq = jax.jit(jax.grad(lambda p: loss(p, "sequential")))(p0)
g_blk = jax.jit(jax.grad(lambda p: loss(p, "basis", sub_engine="block")))(p0)
g_std = jax.jit(
    jax.grad(lambda p: loss(p, "basis", sub_engine="steady", n_warmup=512))
)(p0)
print(f"grad seq   = {np.asarray(g_seq)}")
print(f"grad block = {np.asarray(g_blk)}")
print(f"grad steady= {np.asarray(g_std)}")
rel_b = float(jnp.max(jnp.abs(g_blk - g_seq) / (jnp.abs(g_seq) + 1e-9)))
rel_s = float(jnp.max(jnp.abs(g_std - g_seq) / (jnp.abs(g_seq) + 1e-9)))
print(f"grad rel: block={rel_b:.2e} steady={rel_s:.2e}")
