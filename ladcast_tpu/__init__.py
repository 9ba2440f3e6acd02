"""LaDCast-TPU: TPU-native latent-diffusion ensemble weather forecasting.

A ground-up JAX/XLA/Pallas framework with the capabilities of the
reference PyTorch LaDCast (tonyzyl/ladcast): DCAE compression autoencoder,
LaDCast diffusion transformer, EDM samplers, autoregressive ensemble
rollout, training, evaluation and tooling -- redesigned TPU-first.
"""

__version__ = "0.1.0"
