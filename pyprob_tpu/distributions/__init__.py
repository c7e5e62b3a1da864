from .distribution import Distribution
from .normal import Normal
from .uniform import Uniform
from .categorical import Categorical
from .bernoulli import Bernoulli
from .binomial import Binomial
from .poisson import Poisson
from .exponential import Exponential
from .gamma import Gamma
from .beta import Beta
from .log_normal import LogNormal
from .von_mises import VonMises
from .weibull import Weibull
from .truncated_normal import TruncatedNormal
from .laplace import Laplace
from .student_t import StudentT
from .dirichlet import Dirichlet
from .multivariate_normal import MultivariateNormal
from .cauchy import Cauchy
from .half_cauchy import HalfCauchy
from .half_normal import HalfNormal
from .gumbel import Gumbel
from .logistic import Logistic
from .chi2 import Chi2
from .geometric import Geometric
from .inverse_gamma import InverseGamma
from .pareto import Pareto
from .negative_binomial import NegativeBinomial
from .multinomial import Multinomial
from .lkj import LKJCholesky, LKJCholeskyCPCNormal
from .censored import Censored
from .zero_inflated import ZeroInflated
from .mixture import Mixture
from .factor import Factor
from .empirical import Empirical, EmpiricalType

__all__ = [
    "Distribution",
    "Normal",
    "Uniform",
    "Categorical",
    "Bernoulli",
    "Binomial",
    "Poisson",
    "Exponential",
    "Gamma",
    "Beta",
    "LogNormal",
    "VonMises",
    "Weibull",
    "TruncatedNormal",
    "Laplace",
    "StudentT",
    "Dirichlet",
    "MultivariateNormal",
    "Cauchy",
    "HalfCauchy",
    "HalfNormal",
    "Gumbel",
    "Logistic",
    "Chi2",
    "Geometric",
    "InverseGamma",
    "Pareto",
    "NegativeBinomial",
    "Multinomial",
    "LKJCholesky",
    "LKJCholeskyCPCNormal",
    "Censored",
    "ZeroInflated",
    "Mixture",
    "Factor",
    "Empirical",
    "EmpiricalType",
]
