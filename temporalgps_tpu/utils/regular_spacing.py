"""RegularSpacing — the time-invariant fast-path input type.

Mirror of the reference's lazy `RegularSpacing(t0, dt, N)` AbstractVector
(reference: src/util/regular_data.jl:8-22). Marking inputs as regularly spaced
is what lets the kernel->SSM compiler emit a *single* shared (A, Q) pair
instead of N per-step matrices (reference: src/gp/lti_sde.jl:148-160) — under
jit this is the difference between O(1) and O(N) parameter memory, and it is
what makes the 10M-step workloads feasible.
"""

import jax.numpy as jnp

from .pytrees import pytree_dataclass


@pytree_dataclass(static_fields=("N",))
class RegularSpacing:
    t0: jnp.ndarray  # scalar
    dt: jnp.ndarray  # scalar
    N: int

    def __len__(self):
        return self.N

    def to_array(self):
        return self.t0 + self.dt * jnp.arange(self.N, dtype=jnp.result_type(self.t0, self.dt))

    def stretch(self, a):
        """Time-axis rescaling t -> a*t (reference: src/gp/lti_sde.jl:373)."""
        return RegularSpacing(a * self.t0, a * self.dt, self.N)


def is_regular(x) -> bool:
    return isinstance(x, RegularSpacing)


def time_array(x):
    """Concrete array of times for either input representation."""
    return x.to_array() if isinstance(x, RegularSpacing) else jnp.asarray(x)


def num_times(x) -> int:
    return x.N if isinstance(x, RegularSpacing) else len(x)
