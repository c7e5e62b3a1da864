from .mcmc import ChainState, vectorized_mcmc_posterior

__all__ = ["ChainState", "vectorized_mcmc_posterior"]


def __getattr__(name):
    # lazy to keep package import light (vi pulls in optax)
    if name == "vectorized_vi_posterior":
        from .vi import vectorized_vi_posterior

        return vectorized_vi_posterior
    if name == "vectorized_hmc_posterior":
        from .hmc import vectorized_hmc_posterior

        return vectorized_hmc_posterior
    if name == "GradientChainState":
        from .hmc import GradientChainState

        return GradientChainState
    if name == "vectorized_nuts_posterior":
        from .nuts import vectorized_nuts_posterior

        return vectorized_nuts_posterior
    if name == "vectorized_pt_posterior":
        from .pt import vectorized_pt_posterior

        return vectorized_pt_posterior
    if name == "vectorized_tempered_smc_posterior":
        from .tempered_smc import vectorized_tempered_smc_posterior

        return vectorized_tempered_smc_posterior
    if name in ("vectorized_laplace_posterior", "map_estimate", "MAPResult"):
        from . import laplace

        return getattr(laplace, name)
    raise AttributeError(name)
