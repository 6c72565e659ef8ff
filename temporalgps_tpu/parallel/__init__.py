from .sharded import (
    sharded_elbo,
    sharded_logpdf,
    sharded_logpdf_basis,
    sharded_posterior_marginals,
    sharded_posterior_rand,
    sharded_steady_logpdf,
)

__all__ = [
    "sharded_elbo",
    "sharded_logpdf",
    "sharded_logpdf_basis",
    "sharded_posterior_marginals",
    "sharded_posterior_rand",
    "sharded_steady_logpdf",
]
