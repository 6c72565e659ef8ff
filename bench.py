"""Benchmark entry point (driver-run, real TPU).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "configs": {...}}

The headline metric is BASELINE.md config #2 (logpdf + hyperparameter
gradient, Matern-5/2, N=1M, f32 — reference: examples/exact_time_learning.jl);
`vs_baseline` is its speedup over the sequential-scan engine (the reference
publishes no numbers, BASELINE.md, so the sequential engine is the baseline
stand-in). The `configs` object carries all five BASELINE workload configs:

  c1: Matern-3/2 N=10k static path — rand / logpdf / posterior marginals
      (reference: examples/exact_time_inference.jl)
  c2: hyperparameter-learning step, Matern-5/2 N=1M (headline)
  c3: sum kernel at state-dim 19 (Matern52 + Matern32 + ApproxPeriodic), N=1M
  c4: exact spatio-temporal Separable(EQ, Matern52), 50-space x 1000-time grid
      (reference: examples/exact_space_time_inference.jl)
  c5: approx spatio-temporal DTC/ELBO learning step (elbo + grad), M inducing
      points (reference: examples/approx_space_time_learning.jl)

Each config that fails records {"error": ...} instead of aborting the run.
All diagnostics go to stderr; stdout carries only the JSON line.

TGPS_BENCH_SMOKE=1 shrinks every workload for a fast CPU logic check.
"""

import json
import os
import signal
import sys
import threading
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("TGPS_BENCH_CPU", "") == "1":
    # smoke-test logic on CPU (the env var alone is overridden by the axon
    # TPU plugin; jax.config wins — see tests/conftest.py). CPU runs must
    # NOT share the TPU cache dir: XLA:CPU AOT entries poison across host
    # swaps (see config.host_cpu_cache_tag); TPU executables are immune.
    jax.config.update("jax_platforms", "cpu")
    from temporalgps_tpu.config import host_cpu_cache_tag

    _cache = f"/tmp/tgps_bench_cpu_cache_{host_cpu_cache_tag()}"
else:
    _cache = "/tmp/tgps_jax_cache"
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

SMOKE = os.environ.get("TGPS_BENCH_SMOKE", "") == "1"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# deadline safety (round-3 post-mortem: the driver's `timeout` killed the
# process AFTER every config had printed its numbers to stderr but BEFORE
# the single stdout JSON line — twice in a row). Three layers:
#   1. an internal wall-clock budget checked between configs (skip the rest
#      with {"skipped": "budget"} instead of dying mid-compile),
#   2. a watchdog THREAD that dumps the JSON and exits at the hard deadline
#      — a thread, not a signal handler, because the main thread spends
#      minutes blocked inside remote-compile RPCs where Python signal
#      handlers cannot run,
#   3. SIGTERM/SIGINT handlers for the cases where the main thread IS in
#      bytecode when the driver's timeout fires.
# ---------------------------------------------------------------------------

BUDGET_S = float(os.environ.get("TGPS_BENCH_BUDGET_S", "1500"))  # soft, 25 min
HARD_DEADLINE_S = float(os.environ.get("TGPS_BENCH_HARD_S", str(BUDGET_S + 420)))
_T0 = time.time()
_CONFIGS = {}  # mutated in place by main(); read by the emergency dump
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _elapsed():
    return time.time() - _T0


def _budget_left():
    return BUDGET_S - _elapsed()


def _emit(configs):
    """Print the one stdout JSON line, exactly once (thread-safe)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
    head = configs.get("c2_matern52_n1m_learning", {}) or {}
    print(
        json.dumps(
            {
                "metric": "matern52_logpdf_grad_timesteps_per_sec_N1e6_f32",
                "value": head.get("value"),
                "unit": "timesteps/s",
                "vs_baseline": head.get("vs_baseline"),
                "elapsed_s": round(_elapsed(), 1),
                "configs": configs,
            }
        ),
        flush=True,
    )


def _emergency_dump(reason):
    log(f"bench: emergency dump ({reason}) at t={_elapsed():.0f}s")
    for name in list(_CONFIGS):
        if _CONFIGS[name] is None:
            _CONFIGS[name] = {"skipped": reason}
    _emit(_CONFIGS)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


def _watchdog():
    while True:
        left = HARD_DEADLINE_S - _elapsed()
        if left <= 0:
            _emergency_dump("hard deadline")
        time.sleep(min(max(left, 1.0), 30.0))


def _install_deadline_guards():
    threading.Thread(target=_watchdog, daemon=True).start()
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, lambda *_: _emergency_dump("signal"))
        except (ValueError, OSError):
            pass


_RT_FLOOR = None  # host round-trip floor, measured once


def _roundtrip_floor():
    global _RT_FLOOR
    if _RT_FLOOR is None:
        f = jax.jit(lambda x: x + 1.0)
        z = jnp.zeros(())
        float(f(z))
        t0 = time.perf_counter()
        for _ in range(10):
            float(f(z))
        _RT_FLOOR = (time.perf_counter() - t0) / 10
        log(f"host round-trip floor: {_RT_FLOOR*1e3:.2f} ms")
    return _RT_FLOOR


def timed(fn, *args, iters=50, check_finite=True):
    """Amortised device timing for the tunneled axon backend:
    block_until_ready does not force execution (see CLAUDE.md), and a
    per-iteration host fetch costs a ~27 ms round trip — so enqueue `iters`
    executions (FIFO on device) and fetch ONLY the final scalar; per-iter
    time is (elapsed - one round-trip floor) / iters.

    check_finite (default ON) fully fetches the first call's output and
    asserts every element is finite BEFORE the timing loop runs — a NaN
    graph must fail its config loudly, never record a plausible-looking
    number (round-4 post-mortem: c3 timed a reverse-mode graph whose
    gradient was NaN)."""
    floor = _roundtrip_floor()
    t0 = time.perf_counter()
    out = fn(*args)
    _fetch(out)
    compile_s = time.perf_counter() - t0
    if check_finite:
        _assert_finite(out)
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    out = fn(*args)
    _fetch(out)
    dt = max((time.perf_counter() - t0 - floor) / iters, 1e-9)
    return dt, compile_s, out


def _fetch(out):
    """Force one scalar to the host (amortised-timing fence)."""
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.asarray(leaves[0]).ravel()[0])


def _assert_finite(out):
    """Full host fetch + finiteness gate on every output leaf."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(out)):
        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            raise AssertionError(
                f"non-finite timed output (leaf {i}): {a.ravel()[:8]}"
            )


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------


def config1(partial=None):
    """Matern-3/2 N=10k static path: rand / logpdf / posterior marginals."""
    partial = {} if partial is None else partial
    from temporalgps_tpu import RegularSpacing
    from temporalgps_tpu.gp import GP, ArrayStorage, Matern32, to_sde
    from temporalgps_tpu.gp import lti_sde as api
    from temporalgps_tpu.gp.posterior import marginals as post_marginals
    from temporalgps_tpu.gp.posterior import posterior

    dtype = jnp.float32
    N = 1_000 if SMOKE else 10_000
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    fx = to_sde(GP(Matern32()), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    y = jax.device_put(np.random.default_rng(0).standard_normal(N).astype(np.float32))

    iters = 5 if SMOKE else 50
    f_rand = jax.jit(lambda k: api.rand(k, fx))
    dt_rand, _, _ = timed(f_rand, jax.random.PRNGKey(0), iters=iters)
    partial["rand_ms"] = round(dt_rand * 1e3, 3)
    f_lp = jax.jit(lambda y_: api.logpdf(fx, y_))
    dt_lp, _, _ = timed(f_lp, y, iters=iters)
    partial["logpdf_ms"] = round(dt_lp * 1e3, 3)
    f_pm = jax.jit(lambda y_: post_marginals(posterior(fx, y_)(x, jnp.asarray(0.1, dtype))))
    dt_pm, _, _ = timed(f_pm, y, iters=iters)

    # Sequential-engine stand-in baseline at the same N.
    f_lp_seq = jax.jit(lambda y_: api.logpdf(fx, y_, engine="sequential"))
    dt_seq, _, _ = timed(f_lp_seq, y, iters=2)

    log(
        f"c1 N={N}: rand {dt_rand*1e3:.2f} ms, logpdf {dt_lp*1e3:.2f} ms, "
        f"posterior-marginals {dt_pm*1e3:.2f} ms, seq-logpdf {dt_seq*1e3:.2f} ms"
    )
    return {
        "value": round(N / dt_lp, 1),
        "unit": "logpdf timesteps/s",
        "vs_baseline": round(dt_seq / dt_lp, 2),
        "detail": {
            "rand_ms": round(dt_rand * 1e3, 3),
            "logpdf_ms": round(dt_lp * 1e3, 3),
            "posterior_marginals_ms": round(dt_pm * 1e3, 3),
        },
    }


def config2(partial=None):
    """Headline: logpdf + full hyperparameter gradient, Matern-5/2 N=1M —
    fused forward-mode Pallas pipeline (ops/block.logpdf_fwd_grad)."""
    partial = {} if partial is None else partial
    from temporalgps_tpu import RegularSpacing
    from temporalgps_tpu.gp import GP, ArrayStorage, Matern52, to_sde
    from temporalgps_tpu.gp.lti_sde import build_lgssm
    from temporalgps_tpu.learning import value_and_grad_fwd_lgssm
    from temporalgps_tpu.models import lgssm as lg

    dtype = jnp.float32
    N = 20_000 if SMOKE else 1_000_000
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)
    y = jax.device_put(np.random.default_rng(0).standard_normal(N).astype(np.float32))

    def make_loss(x_, engine):
        def loss(params, y_):
            s2, sc, noise = jnp.exp(params)
            kern = (s2 * Matern52()).stretch(sc)
            fx = to_sde(GP(kern), ArrayStorage(dtype))(x_, noise)
            return lg.logpdf(build_lgssm(fx), y_, engine=engine)

        return loss

    def model_fn_for(x_):
        def model_fn(p):
            s2, sc, noise = jnp.exp(p)
            kern = (s2 * Matern52()).stretch(sc)
            return build_lgssm(to_sde(GP(kern), ArrayStorage(dtype))(x_, noise))

        return model_fn

    p0 = jnp.zeros(3, dtype)
    if SMOKE:
        # Interpret-mode Pallas traces far too slowly on CPU — smoke checks
        # the harness logic with the XLA reverse-mode block path instead.
        def _loss_xla(p, y_):
            s2, sc, noise = jnp.exp(p)
            kern = (s2 * Matern52()).stretch(sc)
            fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
            return lg.logpdf(build_lgssm(fx), y_, engine="block", pallas=False)

        grad_block = jax.jit(
            lambda p, y_: jax.value_and_grad(_loss_xla)(p, y_)[1][0]
        )
    else:
        grad_block = jax.jit(
            lambda p, y_: value_and_grad_fwd_lgssm(model_fn_for(x), y_)(p)[1][0]
        )
    dt_block, cs, _ = timed(grad_block, p0, y, iters=5 if SMOKE else 50)
    steps_per_sec = N / dt_block
    partial["lp_grad_ms"] = round(dt_block * 1e3, 3)
    partial["lp_grad_msteps_per_s"] = round(steps_per_sec / 1e6, 1)
    log(f"c2 lp+grad(fwd) N={N}: {dt_block*1e3:.2f} ms ({steps_per_sec/1e6:.2f} Msteps/s), compile {cs:.0f}s")

    # Forward-only throughput.
    lp_fast = jax.jit(lambda y_: lg.logpdf(
        build_lgssm(to_sde(GP(Matern52()), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))),
        y_, engine="block",
    ))
    dt_f, _, _ = timed(lp_fast, y, iters=10 if SMOKE else 100)
    partial["logpdf_ms"] = round(dt_f * 1e3, 3)
    log(f"c2 logpdf N={N}: {dt_f*1e3:.2f} ms ({N/dt_f/1e6:.1f} Msteps/s)")

    # Baseline stand-in: sequential engine per-step rate at N=20k.
    N_seq = 2_000 if SMOKE else 20_000
    from temporalgps_tpu import RegularSpacing as RS

    x_s = RS(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N_seq)
    y_s = y[:N_seq]
    grad_seq = jax.jit(lambda p, y_: jax.value_and_grad(make_loss(x_s, "sequential"))(p, y_)[1][0])
    dt_seq, _, _ = timed(grad_seq, p0, y_s, iters=3)
    seq_steps_per_sec = N_seq / dt_seq
    log(f"c2 seq lp+grad N={N_seq}: {dt_seq*1e3:.2f} ms ({seq_steps_per_sec/1e6:.3f} Msteps/s)")

    # Correctness cross-checks at N_seq.
    lp_b = float(jax.jit(make_loss(x_s, "block"))(p0, y_s))
    lp_s = float(jax.jit(make_loss(x_s, "sequential"))(p0, y_s))
    rel = abs(lp_b - lp_s) / abs(lp_s)
    log(f"c2 cross-check: block={lp_b:.2f} seq={lp_s:.2f} rel={rel:.2e}")
    assert rel < 1e-3, "engine mismatch"
    if SMOKE:
        g_f = float(grad_seq(p0, y_s))  # smoke: skip the Pallas fused path
    else:
        g_f = float(jax.jit(lambda p: value_and_grad_fwd_lgssm(model_fn_for(x_s), y_s)(p)[1][0])(p0))
    g_s = float(grad_seq(p0, y_s))
    grel = abs(g_f - g_s) / max(abs(g_s), 1e-12)
    log(f"c2 grad cross-check: fused={g_f:.4f} seq={g_s:.4f} rel={grel:.2e}")
    assert grel < 1e-2, "gradient mismatch"

    return {
        "value": round(steps_per_sec, 1),
        "unit": "lp+grad timesteps/s",
        "vs_baseline": round(steps_per_sec / seq_steps_per_sec, 2),
        "detail": {
            "lp_grad_ms": round(dt_block * 1e3, 3),
            "logpdf_ms": round(dt_f * 1e3, 3),
            "logpdf_msteps_per_s": round(N / dt_f / 1e6, 1),
            "cross_check_rel": float(f"{rel:.2e}"),
            "grad_cross_check_rel": float(f"{grel:.2e}"),
        },
    }


def config3(partial=None):
    """Sum kernel at state-dim 19 (Matern52 + Matern32 + ApproxPeriodic),
    N=1M f32 — BASELINE metric: lp+grad timesteps/s at moderate state dim.
    The deterministic cosine blocks are marginalised in closed form by the
    basis engine (ops/basis.py); the steady sub-engine's constant-gain
    grams give the fast lp+grad path (f32 grads proven 5e-5 of the f64
    sequential truth on CPU — tests/test_basis_engine.py,
    test_basis_steady_matches_sequential)."""
    partial = {} if partial is None else partial
    from temporalgps_tpu import RegularSpacing
    from temporalgps_tpu.gp import (
        GP,
        ApproxPeriodic,
        ArrayStorage,
        Matern32,
        Matern52,
        to_sde,
    )
    from temporalgps_tpu.gp import lti_sde as api
    from temporalgps_tpu.gp.lti_sde import basis_setup, build_lgssm
    from temporalgps_tpu.models import lgssm as lg
    from temporalgps_tpu.ops import steady

    dtype = jnp.float32
    N = 5_000 if SMOKE else 1_000_000
    x = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N)

    def make_fx(p, x_):
        s2, sc, noise = jnp.exp(p)
        kern = (
            s2 * Matern52()
            + 0.6 * Matern32().stretch(sc)
            + 0.3 * ApproxPeriodic(0.5)
        )
        return to_sde(GP(kern), ArrayStorage(dtype))(x_, noise)

    p0 = jnp.log(jnp.asarray([1.0, 0.5, 0.1], dtype))
    fx = make_fx(p0, x)
    model = build_lgssm(fx)
    y = jax.device_put(np.random.default_rng(0).standard_normal(N).astype(np.float32))
    # host-side warmup choice (steady approximation contract, ops/steady.py).
    # The truncation error of switching to constant gains at step k is
    # N-independent (gain deviation ~tol at step k, decaying geometrically),
    # and the f64-emulated exact head dominates both runtime and cold-compile
    # time at this shape. Measured vs the f64 sequential oracle
    # (probes/head_dtype_check.py, N=20k/100k): tol=1e-2 (k=2688) keeps
    # grads at 2.5e-5 — same order as tol=1e-6 (k=8064) — with a 3x
    # smaller head.
    k = int(steady.suggest_warmup(basis_setup(fx)[0], tol=1e-2))
    partial["n_warmup"] = k

    # lp+grad through the basis/steady engine (3 hyperparameters).
    def loss(p, y_, x_=x, sub="steady", kw=None):
        return api.logpdf(
            make_fx(p, x_), y_, engine="basis", sub_engine=sub,
            **(kw or {"n_warmup": k, "nan_fallback": False})
        )

    # Cheap small-shape gradient gate FIRST (round-4 post-mortem: the
    # N=1M graphs compiled for ~20 min and then the gate failed anyway).
    # grad cross-check: f32 basis/steady vs the f64 basis/steady oracle.
    # The oracle runs on the HOST CPU (jax.default_device): TPU f64 is
    # emulated AND its N=20k f64 reverse graph cost ~10 min of remote
    # compile per bench run. A small shape keeps both sides' compiles
    # seconds-scale; accuracy transfers (the engines are shape-uniform).
    N_c = 1_000 if SMOKE else 4_096
    x_c = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N_c)
    y_c = y[:N_c]
    kws = min(k, N_c // 2)

    def loss64(p):
        s2, sc, noise = jnp.exp(p)
        kern = (
            s2 * Matern52()
            + 0.6 * Matern32().stretch(sc)
            + 0.3 * ApproxPeriodic(0.5)
        )
        x64 = RegularSpacing(
            jnp.asarray(0.0, jnp.float64), jnp.asarray(0.001, jnp.float64), N_c
        )
        fx64 = to_sde(GP(kern), ArrayStorage(jnp.float64))(x64, noise)
        return api.logpdf(
            fx64, jnp.asarray(np.asarray(y_c), jnp.float64), engine="basis",
            sub_engine="steady", n_warmup=kws, nan_fallback=False,
        )

    # Split gate (round 5, probes/c3_engine_gate.py): the c3 gradient is
    # (model-build Jacobian) o (engine gradient). The model build + basis
    # columns + per-hyperparameter tangents are computed on the HOST CPU
    # (correctly-rounded f32 from true-f64 closed forms); the device under
    # test computes only the ENGINE jvp on those concrete inputs, in
    # FORWARD mode (the supported on-TPU gradient path for this engine:
    # reverse through the f64-emulated scans is structurally wrong on
    # v5e, probes/c3_key_bisect.py; fwd == rev on CPU at 3.4e-5).
    # Rationale: XLA:TPU's f64 emulation computes transcendentals
    # (exp/cos/log) at ~f32 grade, so the TPU-built f32 model differs from
    # the CPU-built one by ~1 ulp, which the tiny d/dlog(s2) component
    # amplifies to ~1.5e-3 — cross-backend input rounding, not engine
    # error (engine gate measured 3.5e-5). Both numbers are recorded.
    from temporalgps_tpu.config import precision_ctx
    from temporalgps_tpu.ops import basis as bops

    def build_inputs(p, x_=x_c):
        return basis_setup(make_fx(p, x_))

    def engine_loss(inputs, y_):
        model_r, M_cols, P0_b = inputs
        Y = jnp.concatenate([y_[:, None], M_cols], axis=-1)
        w_off = jnp.zeros(M_cols.shape[-1] + 1, dtype).at[0].set(1.0)
        with precision_ctx(model_r.latent_dim):
            ld, gram = bops.grams_steady(model_r, Y, w_off, n_warmup=kws,
                                         fwd_mode=True)
            return bops.marginalised_lml(ld, gram, P0_b, N_c, dtype)

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        g_ref = np.asarray(
            jax.jit(jax.grad(loss64))(jnp.asarray(np.log([1.0, 0.5, 0.1])))
        )
        tangents = []
        for i in range(3):
            e_i = jnp.zeros(3, dtype).at[i].set(1.0)
            inputs_c, din = jax.jit(
                lambda q, t: jax.jvp(build_inputs, (q,), (t,)))(p0, e_i)
            tangents.append(din)
    jvp_eng = jax.jit(lambda x_in, t: jax.jvp(
        lambda z: engine_loss(z, y_c), (x_in,), (t,))[1])
    g_bs = np.asarray([float(jvp_eng(inputs_c, t)) for t in tangents],
                      np.float64)
    grel = float(
        np.max(np.abs(g_bs - g_ref) / (np.abs(g_ref) + 1e-9))
    )
    log(f"c3 ENGINE grad gate vs f64 oracle: rel={grel:.2e} g={g_bs} "
        f"g64={g_ref}")
    assert grel < 1e-3, "c3 engine gradient mismatch"

    # full-chain fwd grad (model build on-device too): recorded, not
    # gated — carries the documented ~1e-3-class cross-backend model
    # rounding in the smallest component.
    g_fc = np.asarray(
        jax.jit(
            jax.jacfwd(lambda q: loss(
                q, y_c, x_c, "steady",
                {"n_warmup": kws, "nan_fallback": False, "fwd_mode": True},
            ))
        )(p0)
    )
    grel_fc = float(
        np.max(np.abs(g_fc.astype(np.float64) - g_ref) / (np.abs(g_ref) + 1e-9))
    )
    log(f"c3 full-chain fwd grad rel={grel_fc:.2e} g={g_fc}")
    assert np.isfinite(g_fc).all() and grel_fc < 2e-2, "c3 full chain broken"


    # sequential yardstick: logpdf on the full D=19 state (safe default).
    f_seq = jax.jit(lambda y_: lg.logpdf(model, y_, engine="sequential"))
    dt_seq, cs, _ = timed(f_seq, y, iters=2)
    val_seq = float(f_seq(y))
    partial["sequential_ms"] = round(dt_seq * 1e3, 2)
    log(
        f"c3 D={model.latent_dim} N={N} logpdf[sequential]: {dt_seq*1e3:.2f} ms "
        f"({N/dt_seq/1e6:.2f} Msteps/s) compile {cs:.0f}s val={val_seq:.1f}"
    )

    # basis/steady logpdf (reduced stochastic state, constant-gain grams).
    # Bench data is dense, so skip compiling the traced-NaN lax.cond
    # fallback branch (a full-N block-grams graph: ~2x compile, and its
    # reverse pass is the expensive path).
    f_fast = jax.jit(
        lambda y_: api.logpdf(
            fx, y_, engine="basis", sub_engine="steady", n_warmup=k,
            nan_fallback=False,
        )
    )
    dt_f, cs, _ = timed(f_fast, y, iters=3 if SMOKE else 20)
    val_f = float(f_fast(y))
    rel = abs(val_f - val_seq) / abs(val_seq)
    partial["logpdf_ms"] = round(dt_f * 1e3, 2)
    log(
        f"c3 logpdf[basis/steady]: {dt_f*1e3:.2f} ms ({N/dt_f/1e6:.1f} Msteps/s) "
        f"compile {cs:.0f}s val={val_f:.1f} rel-vs-seq={rel:.2e}"
    )
    assert rel < 5e-3, "c3 engine mismatch"

    g_fast = jax.jit(lambda p, y_: jax.jacfwd(
        lambda q: loss(q, y_, kw={"n_warmup": k, "nan_fallback": False,
                                  "fwd_mode": True}))(p)[0])
    dt_g, cs, _ = timed(g_fast, p0, y, iters=3 if SMOKE else 10)
    steps_per_sec = N / dt_g
    partial["lp_grad_ms"] = round(dt_g * 1e3, 2)
    partial["lp_grad_msteps_per_s"] = round(steps_per_sec / 1e6, 1)
    log(
        f"c3 lp+grad[basis/steady] N={N}: {dt_g*1e3:.2f} ms "
        f"({steps_per_sec/1e6:.1f} Msteps/s) compile {cs:.0f}s"
    )

    # baseline stand-in: sequential f32 lp+grad on the full state at N=20k
    # (timing only — f32 reverse-mode through the full det-block state is
    # ~12% off the f64 truth at N=2k, measured; the basis/steady grad is
    # the only correct f32 path for this family).
    N_s = 2_000 if SMOKE else 20_000
    x_s = RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.001, dtype), N_s)
    y_s = y[:N_s]
    g_seq = jax.jit(
        lambda p, y_: jax.value_and_grad(
            lambda q: lg.logpdf(build_lgssm(make_fx(q, x_s)), y_, engine="sequential")
        )(p)[1][0]
    )
    dt_gs, _, _ = timed(g_seq, p0, y_s, iters=2)
    seq_steps_per_sec = N_s / dt_gs
    log(
        f"c3 seq lp+grad N={N_s}: {dt_gs*1e3:.2f} ms "
        f"({seq_steps_per_sec/1e6:.3f} Msteps/s)"
    )


    return {
        "value": round(steps_per_sec, 1),
        "unit": "lp+grad timesteps/s",
        "vs_baseline": round(steps_per_sec / seq_steps_per_sec, 2),
        "detail": {
            "engine": "basis/steady",
            "state_dim": int(model.latent_dim),
            "reduced_state_dim": int(basis_setup(fx)[0].latent_dim),
            "lp_grad_ms": round(dt_g * 1e3, 2),
            "logpdf_ms": round(dt_f * 1e3, 2),
            "sequential_logpdf_ms": round(dt_seq * 1e3, 2),
            "value_rel_vs_seq": float(f"{rel:.2e}"),
            "grad_rel_vs_f64_oracle": float(f"{grel:.2e}"),
            "grad_rel_full_chain": float(f"{grel_fc:.2e}"),
            "grad_mode": "fwd (jacfwd; engine gate host-built inputs)",
        },
    }


def config4(partial=None):
    """Exact spatio-temporal: Separable(EQ, Matern52) on a 50-space x
    1000-time grid (reference: examples/exact_space_time_inference.jl)."""
    partial = {} if partial is None else partial
    from temporalgps_tpu import RegularSpacing
    from temporalgps_tpu.gp import EQ, GP, ArrayStorage, Matern52, to_sde
    from temporalgps_tpu.gp import lti_sde as api
    from temporalgps_tpu.models import lgssm as lg
    from temporalgps_tpu.space_time import RectilinearGrid, Separable

    dtype = jnp.float32
    Ns, Nt = (10, 50) if SMOKE else (50, 1000)
    r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
    x = RectilinearGrid(r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt))
    k = Separable(EQ().stretch(0.7), Matern52())
    fx = to_sde(GP(k), ArrayStorage(dtype))(x, jnp.asarray(0.1, dtype))
    model = api.build_lgssm(fx)
    y_tf = jnp.asarray(np.random.default_rng(0).standard_normal((Nt, Ns)), dtype)

    iters = 3 if SMOKE else 20
    f_seq = jax.jit(lambda y_: lg.logpdf(model, y_, engine="sequential"))
    dt_seq, cs, _ = timed(f_seq, y_tf, iters=iters)
    log(
        f"c4 exact {Ns}x{Nt} (D={model.latent_dim}) logpdf[sequential]: "
        f"{dt_seq*1e3:.2f} ms ({Ns*Nt/dt_seq/1e6:.2f} Mobs/s) compile {cs:.0f}s"
    )
    detail = partial
    detail.update(
        sequential_ms=round(dt_seq * 1e3, 2),
        state_dim=int(model.latent_dim),
    )
    dt_best, best_engine = dt_seq, "sequential"
    try:
        y_flat = y_tf.reshape(-1)
        f_kron = jax.jit(lambda y_: api.logpdf(fx, y_, engine="kron"))
        dt_kron, _, _ = timed(f_kron, y_flat, iters=iters)
        v_kron, v_seq = float(f_kron(y_flat)), float(f_seq(y_tf))
        rel = abs(v_kron - v_seq) / abs(v_seq)
        log(f"c4 logpdf[kron]: {dt_kron*1e3:.2f} ms rel-vs-seq={rel:.2e}")
        detail["kron_ms"] = round(dt_kron * 1e3, 2)
        detail["kron_rel_vs_seq"] = float(f"{rel:.2e}")
        if rel < 5e-3 and dt_kron < dt_best:
            dt_best, best_engine = dt_kron, "kron"
    except Exception as e:  # noqa: BLE001 — per-engine resilience
        log(f"c4 [kron] failed: {type(e).__name__}: {e}")
    detail["engine"] = best_engine

    # Reference's own big-space bench shape (bench/lgssm.jl:69-160:
    # N_space=247, D=741). Regression watch for the big-D path: the auto
    # engine must pick kron here and must never crash the worker.
    try:
        Ns2, Nt2 = (25, 10) if SMOKE else (247, 100)
        r2 = jnp.asarray(np.linspace(-3, 3, Ns2), dtype)
        x2 = RectilinearGrid(
            r2,
            RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt2),
        )
        fx2 = to_sde(GP(k), ArrayStorage(dtype))(x2, jnp.asarray(0.1, dtype))
        y2 = jnp.asarray(
            np.random.default_rng(1).standard_normal(Ns2 * Nt2), dtype
        )
        f_big = jax.jit(lambda y_: api.logpdf(fx2, y_))  # auto engine
        dt_big, cs2, _ = timed(f_big, y2, iters=iters)
        log(
            f"c4b reference shape {Ns2}x{Nt2} (D={3*Ns2}) logpdf[auto]: "
            f"{dt_big*1e3:.2f} ms ({Ns2*Nt2/dt_big/1e6:.2f} Mobs/s) "
            f"compile {cs2:.0f}s"
        )
        detail["ref_shape_247x100_ms"] = round(dt_big * 1e3, 2)
        detail["ref_shape_obs_per_s"] = round(Ns2 * Nt2 / dt_big, 1)
    except Exception as e:  # noqa: BLE001 — per-engine resilience
        log(f"c4b [ref shape] failed: {type(e).__name__}: {e}")
        detail["ref_shape_error"] = f"{type(e).__name__}: {e}"
    return {
        "value": round(Ns * Nt / dt_best, 1),
        "unit": "logpdf obs/s",
        "vs_baseline": round(dt_seq / dt_best, 2),
        "detail": detail,
    }


def config5(partial=None):
    """Approx spatio-temporal DTC: ELBO + hyperparameter gradient, M=5
    inducing points (reference: examples/approx_space_time_learning.jl)."""
    partial = {} if partial is None else partial
    from temporalgps_tpu import RegularSpacing
    from temporalgps_tpu.gp import EQ, GP, ArrayStorage, Matern52, to_sde
    from temporalgps_tpu.space_time import RectilinearGrid, Separable, elbo

    dtype = jnp.float32
    Ns = 5 if SMOKE else 50
    Nt_blk, M = (2_000, 3) if SMOKE else (100_000, 5)
    Nt_st = 4_000 if SMOKE else 1_000_000  # BASELINE spec scale (1M+)
    r = jnp.asarray(np.linspace(-3, 3, Ns), dtype)
    z = jnp.asarray(np.linspace(-3, 3, M), dtype)
    rng0 = np.random.default_rng(0)

    def setup(Nt):
        x = RectilinearGrid(
            r, RegularSpacing(jnp.asarray(0.0, dtype), jnp.asarray(0.01, dtype), Nt)
        )
        y = jnp.asarray(rng0.standard_normal(Nt * Ns), dtype)

        def elbo_fn(p, y_, engine):
            s2, sc, noise = jnp.exp(p)
            kern = s2 * Separable(EQ().stretch(sc), Matern52())
            fx = to_sde(GP(kern), ArrayStorage(dtype))(x, noise)
            # dense bench data: skip the traced-NaN lax.cond (it compiles
            # the block missing-data branch too — reverse-mode HBM bomb at
            # Nt=1M and most of the cold compile)
            return elbo(fx, y_, z, engine=engine, nan_fallback=False)

        return y, elbo_fn

    p0 = jnp.asarray([0.0, 0.0, -2.3], dtype)

    # baseline: the exact block engine at Nt=100k (grad path)
    y_b, fn_b = setup(Nt_blk)
    g_blk = jax.jit(jax.value_and_grad(lambda p, y_: fn_b(p, y_, "block")))
    dt_blk, cs_b, _ = timed(g_blk, p0, y_b, iters=3)
    log(f"c5 block elbo+grad Ns={Ns} M={M} Nt={Nt_blk}: {dt_blk*1e3:.2f} ms "
        f"compile {cs_b:.0f}s")
    partial["block_Nt100k_grad_ms"] = round(dt_blk * 1e3, 2)

    # headline: the steady engine at BASELINE spec scale Nt=1M
    y_s, fn_s = setup(Nt_st)
    f = jax.jit(lambda p, y_: fn_s(p, y_, "steady"))
    dt_f, cs, _ = timed(f, p0, y_s, iters=3 if SMOKE else 5)
    log(f"c5 steady elbo Ns={Ns} M={M} Nt={Nt_st}: {dt_f*1e3:.2f} ms compile {cs:.0f}s")
    partial["elbo_ms"] = round(dt_f * 1e3, 2)
    g = jax.jit(jax.value_and_grad(lambda p, y_: fn_s(p, y_, "steady")))
    dt_g, cs_g, _ = timed(g, p0, y_s, iters=3)
    log(f"c5 steady elbo+grad Ns={Ns} M={M} Nt={Nt_st}: {dt_g*1e3:.2f} ms "
        f"compile {cs_g:.0f}s")
    partial["elbo_grad_ms"] = round(dt_g * 1e3, 2)
    # grad cross-check at the block scale (values must agree; see
    # tests/test_steady_engine.py for the tolerance provenance)
    g_st_small = jax.jit(jax.value_and_grad(lambda p, y_: fn_b(p, y_, "steady")))
    v1, gr1 = g_blk(p0, y_b)
    v2, gr2 = g_st_small(p0, y_b)
    rel_v = abs(float(v1) - float(v2)) / abs(float(v1))
    rel_g = float(jnp.max(jnp.abs(gr1 - gr2) / (jnp.abs(gr1) + 1e-4)))
    log(f"c5 steady-vs-block cross-check: value rel {rel_v:.2e} grad rel {rel_g:.2e}")
    return {
        "value": round(Ns * Nt_st / dt_g, 1),
        "unit": "elbo+grad obs/s",
        # per-observation speedup of the steady path over the exact block path
        "vs_baseline": round((dt_blk / (Ns * Nt_blk)) / (dt_g / (Ns * Nt_st)), 2),
        "detail": {
            "Nt": Nt_st,
            "M": M,
            "elbo_ms": round(dt_f * 1e3, 2),
            "elbo_grad_ms": round(dt_g * 1e3, 2),
            "block_Nt100k_grad_ms": round(dt_blk * 1e3, 2),
            "crosscheck_value_rel": f"{rel_v:.2e}",
            "crosscheck_grad_rel": f"{rel_g:.2e}",
        },
    }


def _relay_listening() -> bool:
    """True if the TPU port-relay (127.0.0.1:810x) has a listener.

    CLAUDE.md recipe: after a TPU-worker crash the relay process dies and
    jax.devices() hangs until the orchestrator respawns it; `ss -ltn` on the
    810x ports is the health check."""
    import re
    import subprocess

    try:
        out = subprocess.run(
            ["ss", "-ltn"], capture_output=True, text=True, timeout=10
        ).stdout
    except Exception:
        return True  # can't tell — fall through to the jax.devices() probe
    # /root/.tpu_init.py PORTS list: 8082..8117 in steps of {2,3,7} per decade
    return bool(re.search(r":8(08|09|10|11)\d\b", out))


def _wait_for_backend(total_s: float = 600.0):
    """Poll relay health with backoff, then resolve jax.devices().

    The round-end capture is unattended: a transient relay outage must not
    turn into a red BENCH artifact (round-2 post-mortem). Polls `ss` until
    the relay listens (up to total_s), then gives jax.devices() bounded
    attempts. Returns the device list or None."""
    import threading
    import time

    deadline = time.time() + total_s
    delay = 5.0
    while not _relay_listening():
        if time.time() >= deadline:
            log("relay never came up within the wait budget")
            return None
        log(f"port-relay not listening; retrying in {delay:.0f}s")
        time.sleep(min(delay, max(0.0, deadline - time.time())))
        delay = min(delay * 2, 120.0)

    while True:
        devs = []
        t = threading.Thread(
            target=lambda: devs.append(jax.devices()), daemon=True
        )
        t.start()
        t.join(max(60.0, deadline - time.time()))
        if devs:
            return devs[0]
        if time.time() >= deadline:
            return None
        log("jax.devices() timed out; re-checking relay and retrying")
        time.sleep(10.0)


def main():
    _install_deadline_guards()
    # Resilient backend bring-up: poll relay health (up to ~10 min) before
    # declaring the TPU unreachable, and only then emit a parseable error
    # line — jax.devices() otherwise blocks forever when the port-relay
    # process has died (seen after a TPU worker crash).
    devs = _wait_for_backend(min(600.0, max(60.0, _budget_left() - 120.0)))
    if devs is None:
        print(json.dumps({
            "metric": "matern52_logpdf_grad_timesteps_per_sec_N1e6_f32",
            "value": None, "unit": "timesteps/s", "vs_baseline": None,
            "error": "TPU backend unreachable (relay poll + jax.devices() "
                     "timed out after 10 min backoff)",
        }))
        sys.exit(1)
    log("devices:", devs)
    plan = [
        # (name, fn, rough worst-case COLD cost in seconds — round-4/5
        # measured actuals; with a prewarmed /tmp/tgps_jax_cache each runs
        # in a fraction of this). c3 goes LAST: its f64 warmup-head compile
        # is the most expensive graph in the suite (round 4: ~20 min cold,
        # starving c4/c5 — never again; the spatio-temporal configs must
        # always get their numbers first).
        ("c2_matern52_n1m_learning", config2, 180.0),
        ("c1_matern32_n10k_static", config1, 60.0),
        ("c4_exact_space_time_50x1000", config4, 180.0),
        ("c5_dtc_elbo_learning", config5, 420.0),
        ("c3_sum_kernel_d19_n1m", config3, 300.0),
    ]
    only = {s for s in os.environ.get("TGPS_BENCH_ONLY", "").split(",") if s}
    if only:  # builder-side subset runs (cache prewarm / single-config probes)
        plan = [p for p in plan if any(p[0].startswith(o) for o in only)]
    for name, _, _ in plan:
        _CONFIGS[name] = None  # placeholder so an emergency dump lists it
    for name, fn, est_cost in plan:
        if _budget_left() < min(est_cost, 120.0):
            log(f"{name} skipped: {_budget_left():.0f}s left of "
                f"{BUDGET_S:.0f}s budget (est cost {est_cost:.0f}s)")
            _CONFIGS[name] = {"skipped": "budget"}
            continue
        log(f"--- {name} (t={_elapsed():.0f}s, budget left "
            f"{_budget_left():.0f}s)")
        partial = {}
        _CONFIGS[name] = {"in_progress": True, "partial": partial}
        try:
            _CONFIGS[name] = fn(partial)
        except Exception as e:  # noqa: BLE001 — emit what succeeded
            log(f"{name} FAILED: {type(e).__name__}: {e}")
            log(traceback.format_exc())
            _CONFIGS[name] = {"error": f"{type(e).__name__}: {e}"}

    _emit(_CONFIGS)


if __name__ == "__main__":
    main()
