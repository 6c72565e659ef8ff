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


@pytree_dataclass(static_fields=("forward", "det_blocks"))
class GaussMarkov:
    As: Any    # (N, D, D) or Fill((D, D))
    offs: Any  # (N, D) or Fill((D,))
    Qs: Any    # (N, D, D) or Fill((D, D))
    x0: Gaussian
    forward: bool = True
    # True when some state blocks have (near-)zero process noise (Cosine /
    # Constant / ApproxPeriodic components, reference: lti_sde.jl:239-320):
    # the parallel element algebra's information component J grows without
    # bound along such directions and the covariance-form combine NaNs in
    # f32 at large N — engine auto-selection must avoid it (measured: the
    # block engine NaNs on a D=19 Matern+ApproxPeriodic sum at N=1e6 f32).
    det_blocks: bool = False

    def __len__(self):
        return time_length((self.As, self.offs, self.Qs))

    @property
    def dim(self) -> int:
        return self.x0.dim
