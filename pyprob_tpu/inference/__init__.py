from .mcmc import ChainState, vectorized_mcmc_posterior

__all__ = ["ChainState", "vectorized_mcmc_posterior"]
