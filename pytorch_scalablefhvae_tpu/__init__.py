"""TPU-native ScalableFHVAE framework.

A from-scratch JAX/XLA/Pallas implementation of the Scalable Factorized
Hierarchical Variational Autoencoder (FHVAE) pipeline for unsupervised,
disentangled speech representation learning (arXiv 1709.07902, 1804.03201).

Capability parity target: BurnhamG/PyTorch-ScalableFHVAE (see SURVEY.md).
The architecture is TPU-first: fixed-shape segment batches, jit/pjit-compiled
functional train steps, a persistent learnable mu2 posterior table that can be
sharded over a device mesh, Pallas kernels for the hot discriminative-softmax
path, and a host C++ feature extractor with Kaldi-parity semantics.
"""

__version__ = "0.1.0"

from pytorch_scalablefhvae_tpu.config import (  # noqa: F401
    DataConfig,
    ExperimentConfig,
    FeatureConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
