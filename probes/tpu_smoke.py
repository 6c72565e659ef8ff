"""MANDATORY end-of-round TPU finite-grad smoke gate.

Value + gradient for every public engine family at small N on the real
TPU, asserting (a) finiteness and (b) agreement with a host-CPU f64
oracle. This is the guard for the failure class CPU tests cannot see
(round-4 shipped a TPU-only all-NaN reverse pass through basis/steady;
round-5 root cause: XLA-TPU f64 cholesky/tri_solve custom calls NaN
inside scan graphs — utils/psd._avoid_native).

Run AFTER the last engine-touching commit of a round:
  cd /root/repo && PYTHONPATH=/root/repo:$PYTHONPATH \
    nohup python probes/tpu_smoke.py > /tmp/tpu_smoke.log 2>&1 &
Poll /tmp/tpu_smoke.log; the last line must be "TPU SMOKE: ALL PASS".

Sections (each independent; failures don't stop later sections):
  g1  scalar Matern52 N=8192 f32: logpdf value + REVERSE grad through
      sequential / block / steady / parallel / sqrt vs CPU-f64 oracle.
  g2  fused fwd-mode JVP path (value_and_grad_fwd, block pallas) + the
      Fisher-identity gradient (value_and_grad_fisher).
  g3  c3 det-block kernel N=4096 f32: basis/steady value + reverse grad
      (the round-4 NaN shape) vs CPU-f64 basis/steady oracle.
  g4  spatio-temporal: exact grid logpdf sequential vs kron (Ns=96 so the
      kron auto-route engages on TPU) — values only (the kron engine is a
      logpdf/marginals engine; training grads go through elbo in g5).
  g5  ragged (RegularInTime) DTC elbo + reverse grad (block engine; the
      steady engine is grid-only — ragged projections are not Fill) at
      Nt=4096, M=10 inducing points vs a CPU-f64 oracle.
"""

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax

if os.environ.get("TGPS_SMOKE_CPU", "") == "1":  # logic check only
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/tgps_jax_cache" if os.environ.get("TGPS_SMOKE_CPU", "") != "1" else "/tmp/tgps_smoke_cpu_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import (EQ, GP, ApproxPeriodic, ArrayStorage,
                                Matern32, Matern52, to_sde)
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.learning import value_and_grad_fwd

dtype = jnp.float32
FAILURES = []
PASSES = []


def cpu_dev():
    return jax.local_devices(backend="cpu")[0]


def check(name, got, want, tol, finite_only=False):
    got = np.asarray(got, np.float64)
    if not np.isfinite(got).all():
        FAILURES.append(f"{name}: NON-FINITE {got}")
        print(f"[FAIL] {name}: non-finite {got}", flush=True)
        return
    if finite_only:
        PASSES.append(name)
        print(f"[pass] {name}: finite {got}", flush=True)
        return
    want = np.asarray(want, np.float64)
    rel = float(np.max(np.abs(got - want) / (np.abs(want) + 1e-9)))
    if rel < tol:
        PASSES.append(name)
        print(f"[pass] {name}: rel={rel:.2e}", flush=True)
    else:
        FAILURES.append(f"{name}: rel={rel:.2e} got={got} want={want}")
        print(f"[FAIL] {name}: rel={rel:.2e} got={got} want={want}",
              flush=True)


def section(fn):
    t0 = time.perf_counter()
    try:
        fn()
    except Exception:  # noqa: BLE001
        FAILURES.append(f"{fn.__name__}: RAISED")
        print(f"[FAIL] {fn.__name__} raised:\n{traceback.format_exc()}",
              flush=True)
    print(f"-- {fn.__name__} done in {time.perf_counter()-t0:.0f}s",
          flush=True)


y_np = np.random.default_rng(0).standard_normal(8192)


def g1():
    N = 8192

    def loss(p, dt, engine, **kw):
        s2, sc, noise = jnp.exp(p.astype(dt))
        x = RegularSpacing(jnp.asarray(0.0, dt), jnp.asarray(0.01, dt), N)
        fx = to_sde(GP(s2 * Matern52().stretch(sc)), ArrayStorage(dt))(x, noise)
        return api.logpdf(fx, jnp.asarray(y_np, dt), engine=engine, **kw)

    p64 = jnp.log(jnp.asarray([1.3, 0.7, 0.1]))
    p32 = p64.astype(dtype)
    with jax.default_device(cpu_dev()):
        v64, g64 = jax.jit(jax.value_and_grad(
            lambda p: loss(p, jnp.float64, "sequential")))(p64)
    v64, g64 = float(v64), np.asarray(g64)
    print(f"g1 oracle v={v64:.4f} g={g64}", flush=True)

    for eng, kw in [("sequential", {}), ("block", {}),
                    ("steady", {"n_warmup": 1024}), ("parallel", {})]:
        # the parallel (assoc-scan) engine's reverse is the transpose of
        # its forward ops: at the D<=4 ambient default those are bf16 on
        # TPU and the grads come out ~1e-1 off. The documented gradient
        # recipe for this engine is an explicit 'highest' scope (the
        # sequential/fused-fwd/fisher paths handle it internally).
        import contextlib

        ctx = (jax.default_matmul_precision("highest") if eng == "parallel"
               else contextlib.nullcontext())
        with ctx:
            v, g = jax.jit(jax.value_and_grad(
                lambda p: loss(p, dtype, eng, **kw)))(p32)
        check(f"g1 {eng} value", float(v), v64, 1e-3)
        check(f"g1 {eng} rev-grad", g, g64, 5e-3)
    # sqrt is the numerically-armoured FORWARD path: reverse-mode AD
    # through QR is undefined at the rank-deficient zero-padded roots
    # (ops/sqrt.py docstring) — value-only here, by contract.
    v = jax.jit(lambda p: loss(p, dtype, "sqrt"))(p32)
    check("g1 sqrt value (fwd-only contract)", float(v), v64, 1e-3)


def g2():
    N = 8192
    from temporalgps_tpu.learning import value_and_grad_fwd_lgssm
    from temporalgps_tpu.gp.lti_sde import build_lgssm

    # the on-TPU forward-mode verb is value_and_grad_fwd_lgssm (fused
    # Pallas phase kernels); generic jax.jvp over engine="block" rejects
    # the pallas custom_vjp by design (loud TypeError, not silent wrong).
    def model_fn(p):
        s2, sc, noise = jnp.exp(p)
        x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), N)
        return build_lgssm(
            to_sde(GP(s2 * Matern52().stretch(sc)), ArrayStorage(dtype))(x, noise)
        )

    p32 = jnp.log(jnp.asarray([1.3, 0.7, 0.1], dtype))
    with jax.default_device(cpu_dev()):
        g64 = np.asarray(jax.jit(jax.grad(
            lambda p: _loss64_g1(p)))(p32.astype(jnp.float64)))
    v, g = jax.jit(
        value_and_grad_fwd_lgssm(model_fn, jnp.asarray(y_np, dtype))
    )(p32)
    check("g2 fused-fwd value", float(v), None, 0, finite_only=True)
    check("g2 fused-fwd grad", g, g64, 5e-3)

    from temporalgps_tpu.learning import value_and_grad_fisher

    def model_fn(p):
        s2, sc, noise = jnp.exp(p)
        x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), N)
        return build_lgssm(
            to_sde(GP(s2 * Matern52().stretch(sc)), ArrayStorage(dtype))(x, noise)
        )

    vf, gf = jax.jit(
        lambda p: value_and_grad_fisher(model_fn, jnp.asarray(y_np, dtype))(p)
    )(p32)
    check("g2 fisher grad", gf, g64, 5e-3)


def _loss64_g1(p):
    N = 8192
    s2, sc, noise = jnp.exp(p)
    x = RegularSpacing(jnp.asarray(0.0, jnp.float64),
                       jnp.asarray(0.01, jnp.float64), N)
    fx = to_sde(GP(s2 * Matern52().stretch(sc)),
                ArrayStorage(jnp.float64))(x, noise)
    return api.logpdf(fx, jnp.asarray(y_np, jnp.float64), engine="sequential")


def g3():
    N, k = 4096, 2048

    def loss(p, dt, fwd=False):
        s2, sc, noise = jnp.exp(p.astype(dt))
        x = RegularSpacing(jnp.asarray(0.0, dt), jnp.asarray(0.001, dt), N)
        kern = (s2 * Matern52() + 0.6 * Matern32().stretch(sc)
                + 0.3 * ApproxPeriodic(0.5))
        fx = to_sde(GP(kern), ArrayStorage(dt))(x, noise)
        return api.logpdf(fx, jnp.asarray(y_np[:N], dt), engine="basis",
                          sub_engine="steady", n_warmup=k, nan_fallback=False,
                          fwd_mode=fwd)

    p64 = jnp.log(jnp.asarray([1.0, 0.5, 0.1]))
    with jax.default_device(cpu_dev()):
        v64, g64 = jax.jit(jax.value_and_grad(
            lambda p: loss(p, jnp.float64)))(p64)
    v = jax.jit(lambda p: loss(p, dtype))(p64.astype(dtype))
    # FORWARD-mode gradient: the supported TPU path for this engine —
    # reverse through the f64-emulated scans is structurally wrong on v5e
    # (probes/c3_key_bisect.py; ops/basis.logpdf_basis docstring).
    g = jax.jit(jax.jacfwd(
        lambda p: loss(p, dtype, fwd=True)))(p64.astype(dtype))
    check("g3 basis/steady value", float(v), float(v64), 5e-3)
    # full-chain fwd grad: carries the documented ~1e-3-class cross-backend
    # model-build rounding in the smallest component (the bench gates the
    # ENGINE gradient with host-built inputs at 1e-3 — measured 3.5e-5,
    # probes/c3_engine_gate.py); the smoke bounds the full chain at 2e-3.
    check("g3 basis/steady fwd-grad (full chain)", g, np.asarray(g64), 2e-3)


def g4():
    from temporalgps_tpu.space_time import RectilinearGrid, Separable

    Ns, Nt = 96, 64
    xl = jnp.linspace(0.0, 5.0, Ns, dtype=dtype)
    ts = jnp.linspace(0.0, 3.0, Nt, dtype=dtype)
    grid = RectilinearGrid(xl, ts)
    kern = Separable(EQ().stretch(0.7), Matern52())
    fx = to_sde(GP(kern), ArrayStorage(dtype))(grid, 0.1)
    y = jnp.asarray(
        np.random.default_rng(1).standard_normal(Ns * Nt), dtype
    )
    v_seq = float(jax.jit(
        lambda y_: api.logpdf(fx, y_, engine="sequential"))(y))
    v_kron = float(jax.jit(lambda y_: api.logpdf(fx, y_, engine="kron"))(y))
    check("g4 kron vs sequential value", v_kron, v_seq, 5e-3)


def g5():
    from temporalgps_tpu.space_time import Separable, elbo, regular_in_time

    Nt, M, Np = 4096, 10, 7
    rng = np.random.default_rng(3)
    pts = [np.sort(rng.uniform(0.0, 5.0, Np)) for _ in range(Nt)]
    y_np5 = rng.standard_normal(Nt * Np)
    # static data structure built OUTSIDE the traced loss (its construction
    # host-converts point arrays; tracing it raises TracerArrayConversion)
    xs = {
        dt: regular_in_time(
            jnp.asarray(np.arange(Nt) * 0.01, dt),
            [jnp.asarray(q, dt) for q in pts],
        )
        for dt in (jnp.float32, jnp.float64)
    }

    def loss(p, dt):
        s2, sc, noise = jnp.exp(p.astype(dt))
        kern = Separable(s2 * EQ().stretch(sc), Matern52())
        fx = to_sde(GP(kern), ArrayStorage(dt))(xs[dt], noise)
        # ragged (RegularInTime) DTC: per-time projections are not Fill, so
        # the steady engine is out of contract — the block engine is the
        # ragged training path (grid DTC + steady is covered by bench c5's
        # on-device cross-checks).
        return elbo(fx, jnp.asarray(y_np5, dt),
                    jnp.linspace(0.0, 5.0, M, dtype=dt), engine="block")

    p64 = jnp.log(jnp.asarray([1.0, 0.8, 0.1]))
    with jax.default_device(cpu_dev()):
        v64, g64 = jax.jit(jax.value_and_grad(
            lambda p: loss(p, jnp.float64)))(p64)
    v, g = jax.jit(jax.value_and_grad(
        lambda p: loss(p, dtype)))(p64.astype(dtype))
    check("g5 dtc-elbo/block (ragged) value", float(v), float(v64), 5e-3)
    check("g5 dtc-elbo/block (ragged) rev-grad", g, np.asarray(g64), 1e-2)


def main():
    print("devices:", jax.devices(), flush=True)
    for fn in (g1, g2, g3, g4, g5):
        section(fn)
    print(f"\n{len(PASSES)} passed, {len(FAILURES)} failed", flush=True)
    for f in FAILURES:
        print(" FAILED:", f, flush=True)
    print("TPU SMOKE: ALL PASS" if not FAILURES else "TPU SMOKE: FAILURES",
          flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
