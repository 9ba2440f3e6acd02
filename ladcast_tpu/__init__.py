"""LaDCast-TPU: TPU-native latent-diffusion ensemble weather forecasting.

A ground-up JAX/XLA/Pallas framework with the capabilities of the
reference PyTorch LaDCast (tonyzyl/ladcast): DCAE compression autoencoder,
LaDCast diffusion transformer, EDM samplers, autoregressive ensemble
rollout, training, evaluation and tooling -- redesigned TPU-first.

Top-level conveniences re-export the most used entry points; submodules
stay import-light (heavy deps like flax load on first model use).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy re-exports to keep `import ladcast_tpu` cheap
    if name in ("DCAEConfig", "LaDCastDiTConfig", "EDMSchedulerConfig",
                "RolloutConfig", "NoiseSamplerConfig",
                "ladcast_375m_config", "ladcast_1p6b_config",
                "dcae_ray_1024_config"):
        from ladcast_tpu import config
        return getattr(config, name)
    if name == "AutoencoderDC":
        from ladcast_tpu.models.dcae import AutoencoderDC
        return AutoencoderDC
    if name == "LaDCastTransformer3D":
        from ladcast_tpu.models.ladcast_dit import LaDCastTransformer3D
        return LaDCastTransformer3D
    if name == "ForecastPipeline":
        from ladcast_tpu.rollout.pipeline import ForecastPipeline
        return ForecastPipeline
    raise AttributeError(f"module 'ladcast_tpu' has no attribute {name!r}")
