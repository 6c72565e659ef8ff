"""GaussMarkov — the latent Markov-chain transition model.

Mirror of the reference's `GaussMarkovModel`
(reference: src/models/gauss_markov_model.jl:20-60):

    x[0]  ~ x0
    x[t]  = A[t] x[t-1] + a[t] + eps[t],   eps[t] ~ N(0, Q[t])

`As`, `offs`, `Qs` are per-step parameter leaves: either arrays with a leading
time axis or `Fill`s (time-invariant). `forward=False` corresponds to the
reference's `Reverse()` ordering tag — the representation of the RTS smoother
as another LGSSM run backwards (reference: src/models/lgssm.jl:193-199).
"""

from typing import Any

from ..utils.fill import time_length
from ..utils.gaussian import Gaussian
from ..utils.pytrees import pytree_dataclass


@pytree_dataclass(static_fields=("forward",))
class GaussMarkov:
    As: Any    # (N, D, D) or Fill((D, D))
    offs: Any  # (N, D) or Fill((D,))
    Qs: Any    # (N, D, D) or Fill((D, D))
    x0: Gaussian
    forward: bool = True

    def __len__(self):
        return time_length((self.As, self.offs, self.Qs))

    @property
    def dim(self) -> int:
        return self.x0.dim
