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
    "Mixture",
    "Factor",
    "Empirical",
    "EmpiricalType",
]
