"""Built-in model families — the canonical benchmark/test models of the
trace-based PPL literature, ready to use and TPU-ready where their control
flow allows (reference counterparts live in tests/examples:
reference tests/test_inference.py, examples/*.ipynb)."""

from .models import (
    GaussianUnknownMean,
    GaussianUnknownMeanMarsaglia,
    GaussianUnknownMeanMarsagliaRejection,
    HiddenMarkovModel,
    Branching,
    BranchingCompiled,
    MiniCaptcha,
    VariableLengthGaussian,
    EightSchools,
    BayesianLinearRegression,
    BayesianLogisticRegression,
    GaussianProcessRegression,
    GaussianMixture,
    LinearGaussianStateSpace,
    LinearGaussianStateSpaceMarkov,
)

__all__ = [
    "GaussianUnknownMean",
    "GaussianUnknownMeanMarsaglia",
    "GaussianUnknownMeanMarsagliaRejection",
    "HiddenMarkovModel",
    "Branching",
    "BranchingCompiled",
    "MiniCaptcha",
    "VariableLengthGaussian",
    "EightSchools",
    "BayesianLinearRegression",
    "BayesianLogisticRegression",
    "GaussianProcessRegression",
    "GaussianMixture",
    "LinearGaussianStateSpace",
    "LinearGaussianStateSpaceMarkov",
]
