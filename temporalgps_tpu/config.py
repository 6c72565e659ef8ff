"""Global configuration for temporalgps_tpu.

The reference library (TemporalGPs.jl) computes in Float64 by default — its
`StorageType{T}` defaults to `Float64` (reference: src/util/storage_types.jl:28-48)
and its oracle tests require ~1e-8 agreement with a dense GP. We therefore enable
JAX x64 at import time unless the user opts out via TEMPORALGPS_X64=0.

Float32 remains available per-model via the `storage` argument of `to_sde`
(mirroring the reference's `SArrayStorage(Float32)` benchmark variants,
reference: bench/single_output_gps.jl "heapF32/stackF32").
"""

import os

import jax

if os.environ.get("TEMPORALGPS_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

# TPU f32 matmuls default to bfloat16 passes; covariance recursions on
# ill-conditioned grams (spatio-temporal kernels, latent dim > 4) lose
# PSD-ness at bf16 and the Cholesky NaNs. Rather than forcing 'highest'
# globally (measured: -17% on the small-state headline, whose 3x3 ops are
# fine at default), the inference drivers trace big-state models under a
# `jax.default_matmul_precision("highest")` context (see precision_ctx).
# TEMPORALGPS_MATMUL_PRECISION forces a global setting as an escape hatch.
_prec_env = os.environ.get("TEMPORALGPS_MATMUL_PRECISION", "")
if _prec_env:
    jax.config.update("jax_default_matmul_precision", _prec_env)


def precision_ctx(latent_dim: int):
    """Matmul-precision context for tracing inference over a model of the
    given state dimension: true-f32 ('highest') for big states, ambient
    default for the small closed-form states (D <= 4)."""
    import contextlib

    if _prec_env:  # global override active: don't fight it
        return contextlib.nullcontext()
    if latent_dim > 4:
        return jax.default_matmul_precision("highest")
    return contextlib.nullcontext()


def ambient_matmul_precision():
    """The matmul precision active at the CURRENT trace point (None =
    backend default). custom_vjp bwd functions are traced OUTSIDE the
    `with precision_ctx(...)` scope that wrapped the forward call, so a
    bwd that re-traces compute (rather than transposing the fwd ops, which
    inherit per-op precision) silently drops to the TPU bf16 default —
    measured round 5: the basis/steady reverse grads came out ~1000x wrong
    on v5e while CPU was exact (probes/c3_fix_check.py). Every such bwd
    must capture this at fwd time and re-apply via matmul_precision_ctx."""
    return jax.config.jax_default_matmul_precision


def matmul_precision_ctx(prec):
    """Context manager applying a captured ambient precision (None = no-op)."""
    import contextlib

    if prec is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(prec)

# Jitter constants, chosen to match the reference semantics exactly:
#  - 1e-12: default observation noise of a FiniteGP over an LTISDE
#    (reference: src/gp/lti_sde.jl:27-29) and `ident_eps` default
#    (reference: src/models/lgssm.jl:242-246).
#  - 1e-9: jitter inside `conditional_rand`
#    (reference: src/models/linear_gaussian_conditionals.jl:86).
#  - 1e-10: jitter on P in LargeOutputLGC.posterior_and_lml and on Pp in
#    `invert_dynamics` (reference: linear_gaussian_conditionals.jl:183,
#    lgssm.jl:235).
#  - 1e15: large-variance fill-in used for missing observations
#    (reference: src/models/missings.jl:43).
DEFAULT_NOISE = 1e-12
IDENT_EPS = 1e-12
RAND_JITTER = 1e-9
POSTERIOR_JITTER = 1e-10
LARGE_VAR = 1e15


def host_cpu_cache_tag() -> str:
    """Fingerprint of the host CPU for persistent-XLA-cache directories.

    XLA:CPU AOT cache entries embed the compile host's machine features but
    the cache KEY does not; the build VM migrates across heterogeneous
    hosts, and a stale entry loads fine yet computes WRONG NUMBERS (chol JVP
    tangents 2x off, `cpu_aot_loader ... SIGILL` on stderr). Per-machine-
    type cache dirs sidestep it. Hashes the full /proc/cpuinfo feature
    surface plus the machine arch — x86 uses 'flags', aarch64 uses
    'Features'; hashing everything keeps unexpected formats distinct rather
    than silently colliding on an empty string.

    The boot id is mixed in too: XLA's AOT target features include
    LLVM-derived tuning preferences (prefer-no-scatter/gather) that two
    hosts with byte-identical /proc/cpuinfo can disagree on (observed
    round 4: a same-fingerprint stale entry loaded with SIGILL warnings
    and broke a bench gradient cross-check). The CPU cache only needs to
    survive within one VM boot (pre-warm run -> driver run); per-boot
    dirs make cross-host poisoning structurally impossible."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            lines = [
                l for l in f
                if l.startswith(("flags", "Features", "model name", "CPU part"))
            ]
        blob = platform.machine() + "".join(sorted(set(lines)))
    except OSError:
        blob = platform.machine() + platform.processor()
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            blob += f.read().strip()
    except OSError:
        pass
    return hashlib.sha1(blob.encode()).hexdigest()[:10]
