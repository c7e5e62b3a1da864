from .layers import (
    Static,
    mlp_init,
    mlp_apply,
    lstm_init,
    lstm_apply,
    lstm_step,
    lstm_zero_state,
    cnn2d5c_init,
    cnn2d5c_apply,
    cnn3d5c_init,
    cnn3d5c_apply,
    num_params,
)
from .proposals import head_kind_for, head_init, head_apply, prior_param_arrays
from .modules import (
    EmbeddingFeedForward,
    EmbeddingCNN2D5C,
    EmbeddingCNN3D5C,
    ProposalNormalNormal,
    ProposalNormalNormalMixture,
    ProposalUniformBeta,
    ProposalUniformBetaMixture,
    ProposalUniformTruncatedNormalMixture,
    ProposalPoissonTruncatedNormalMixture,
    ProposalCategoricalCategorical,
    ProposalBernoulliBernoulli,
)
from .optimizer_larc import larc_scale, LARC
from .dataset import (
    Batch,
    OnlineDataset,
    OfflineDataset,
    OfflineDatasetFile,
    TraceSampler,
    TraceBatchSampler,
    DistributedTraceBatchSampler,
    prune_trace,
)
from .inference_network import InferenceNetwork

# reference class name for the same base (reference:
# pyprob/nn/inference_network.py InferenceNetworkBase; the bare
# "InferenceNetwork" name is the engine-selection enum at package level)
InferenceNetworkBase = InferenceNetwork
from .inference_network_feedforward import InferenceNetworkFeedForward
from .inference_network_lstm import InferenceNetworkLSTM

__all__ = [
    "Static",
    "mlp_init",
    "mlp_apply",
    "lstm_init",
    "lstm_apply",
    "lstm_step",
    "lstm_zero_state",
    "cnn2d5c_init",
    "cnn2d5c_apply",
    "cnn3d5c_init",
    "cnn3d5c_apply",
    "num_params",
    "head_kind_for",
    "head_init",
    "head_apply",
    "prior_param_arrays",
    "larc_scale",
    "Batch",
    "OnlineDataset",
    "OfflineDataset",
    "OfflineDatasetFile",
    "TraceSampler",
    "TraceBatchSampler",
    "DistributedTraceBatchSampler",
    "prune_trace",
    "InferenceNetwork",
    "InferenceNetworkFeedForward",
    "InferenceNetworkLSTM",
]
