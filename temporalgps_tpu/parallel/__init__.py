from .sharded import (
    sharded_logpdf,
    sharded_posterior_marginals,
    sharded_posterior_rand,
    sharded_steady_logpdf,
)

__all__ = [
    "sharded_logpdf",
    "sharded_posterior_marginals",
    "sharded_posterior_rand",
    "sharded_steady_logpdf",
]
