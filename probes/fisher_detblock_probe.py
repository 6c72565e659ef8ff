"""Does the innovations-form Fisher score survive deterministic blocks?

The formulas in ops/fisher.py are Koopman's exact score in disturbance-
smoother variables (mu - m_pred = P_pred r, Sig - P_pred = -P_pred N P_pred)
— derivable from the filter adjoint directly, with NO Q^{-1}, so they should
be valid for singular Q (Cosine / ApproxPeriodic / Constant blocks). The
round-3 docstring gate was conservative. This probe checks, CPU f64:

  1. hyperparameter gradients of the c3 bench kernel
     (Matern52 + 0.6 Matern32.stretch(0.5) + 0.3 ApproxPeriodic(0.5), D=19)
     via value_and_grad_fisher vs autodiff through the sequential engine;
  2. error growth in N (det-subspace filter covariance decays ~1/t — does
     P_pred^{-1} conditioning poison the score at large N?).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python probes/fisher_detblock_probe.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from temporalgps_tpu.config import host_cpu_cache_tag  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/tgps_test_cache_{host_cpu_cache_tag()}"
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

from temporalgps_tpu import RegularSpacing
from temporalgps_tpu.gp import GP, ApproxPeriodic, Matern32, Matern52, to_sde
from temporalgps_tpu.gp import lti_sde as api
from temporalgps_tpu.learning import value_and_grad_fisher
from temporalgps_tpu.models import logpdf


def main():
    rng = np.random.default_rng(0)
    for N in [256, 1024, 4096]:
        x = RegularSpacing(0.0, 0.05, N)
        y = jnp.asarray(rng.standard_normal(N))

        def build(p):
            s2, sc, noise = jnp.exp(p)
            kern = (
                s2 * Matern52()
                + 0.6 * Matern32().stretch(sc)
                + 0.3 * ApproxPeriodic(0.5)
            )
            fx = to_sde(GP(kern))(x, noise)
            return api.build_lgssm(fx)

        p0 = jnp.zeros(3, jnp.float64)
        m = build(p0)
        print(f"N={N} D={m.latent_dim} det_blocks={m.trans.det_blocks}")

        v_f, g_f = jax.jit(value_and_grad_fisher(build, y))(p0)
        v_a, g_a = jax.jit(
            jax.value_and_grad(lambda p: logpdf(build(p), y, engine="sequential"))
        )(p0)
        rel_v = abs(float(v_f - v_a)) / abs(float(v_a))
        rel_g = float(jnp.max(jnp.abs(g_f - g_a) / (jnp.abs(g_a) + 1e-8)))
        print(f"  value: fisher={float(v_f):.6f} auto={float(v_a):.6f} rel={rel_v:.2e}")
        print(f"  grad : fisher={np.asarray(g_f)} ")
        print(f"         auto  ={np.asarray(g_a)}  relmax={rel_g:.2e}")


if __name__ == "__main__":
    main()
