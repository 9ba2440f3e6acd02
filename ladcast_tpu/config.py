"""Typed configuration dataclasses for the LaDCast-TPU framework.

These are the TPU-native equivalents of the reference's diffusers
``register_to_config`` model configs (see /root/reference/ladcast/models/DCAE.py:781-817
and LaDCast_3D_model.py:623-650) and the YAML sections of
configs/ladcast_375M.yaml / configs/DC_AE_84_pretrain.yaml.

Everything is a frozen dataclass so configs are hashable and can be closed
over by jitted functions as static arguments.
"""

from __future__ import annotations

import dataclasses
import json
import math
from dataclasses import dataclass
from typing import Optional, Tuple


def _tup(x):
    if isinstance(x, (list, tuple)):
        return tuple(_tup(v) for v in x)
    return x


@dataclass(frozen=True)
class DCAEConfig:
    """Config for the deep-compression autoencoder.

    Mirrors the 84-latent ERA5 config (reference
    configs/DC_AE_84_pretrain.yaml:1-48): 89 in-channels (84 dynamic + 5
    static), 84 latent channels, 4 stages with 8x total spatial compression.
    """

    in_channels: int = 89
    out_channels: int = 89
    latent_channels: int = 84
    attention_head_dim: int = 32
    encoder_block_types: Tuple[str, ...] = (
        "ResBlock", "ResBlock", "EfficientViTBlock", "EfficientViTBlock")
    decoder_block_types: Tuple[str, ...] = (
        "ResBlock", "ResBlock", "EfficientViTBlock", "EfficientViTBlock")
    encoder_block_out_channels: Tuple[int, ...] = (252, 504, 504, 1008)
    decoder_block_out_channels: Tuple[int, ...] = (252, 504, 504, 1008)
    encoder_layers_per_block: Tuple[int, ...] = (4, 4, 4, 4)
    decoder_layers_per_block: Tuple[int, ...] = (4, 4, 4, 4)
    encoder_qkv_multiscales: Tuple[Tuple[int, ...], ...] = ((), (), (5,), (5,))
    decoder_qkv_multiscales: Tuple[Tuple[int, ...], ...] = ((), (), (5,), (5,))
    upsample_block_type: str = "pixel_shuffle"
    downsample_block_type: str = "pixel_unshuffle"
    decoder_norm_types: Tuple[str, ...] = ("rms_norm",) * 4
    decoder_act_fns: Tuple[str, ...] = ("silu",) * 4
    scaling_factor: float = 1.0
    static_channels: int = 5
    temb_channels: Optional[int] = None
    # v2 options (reference DCAE_new.py:798-800): configurable encoder
    # output / decoder input shortcuts and decoder output activation.
    encoder_out_shortcut: bool = True
    decoder_in_shortcut: bool = True
    decoder_conv_act_fn: str = "relu"

    def __post_init__(self):
        object.__setattr__(self, "encoder_block_types", _tup(self.encoder_block_types))
        object.__setattr__(self, "decoder_block_types", _tup(self.decoder_block_types))
        object.__setattr__(self, "encoder_block_out_channels", _tup(self.encoder_block_out_channels))
        object.__setattr__(self, "decoder_block_out_channels", _tup(self.decoder_block_out_channels))
        object.__setattr__(self, "encoder_layers_per_block", _tup(self.encoder_layers_per_block))
        object.__setattr__(self, "decoder_layers_per_block", _tup(self.decoder_layers_per_block))
        object.__setattr__(self, "encoder_qkv_multiscales", _tup(self.encoder_qkv_multiscales))
        object.__setattr__(self, "decoder_qkv_multiscales", _tup(self.decoder_qkv_multiscales))
        object.__setattr__(self, "decoder_norm_types", _tup(self.decoder_norm_types))
        object.__setattr__(self, "decoder_act_fns", _tup(self.decoder_act_fns))

    @property
    def spatial_compression_ratio(self) -> int:
        # reference DCAE.py:856
        return 2 ** (len(self.encoder_block_out_channels) - 1)


@dataclass(frozen=True)
class LaDCastDiTConfig:
    """Config for the AR diffusion transformer.

    Mirrors reference LaDCast_3D_model.py:623-650 and
    configs/ladcast_375M.yaml / ladcast_1.6B.yaml. Spatial RoPE grid
    positions are stored in *degrees* here; set ``spatial_deg2rad=True`` to
    convert at table-build time (as the reference does at model init,
    LaDCast_3D_model.py:696-701).
    """

    in_channels: int = 84
    out_channels: int = 84
    num_attention_heads: int = 12
    attention_head_dim: int = 128
    num_layers: int = 2              # dual-stream blocks
    num_single_layers: int = 4       # single-stream blocks
    num_refiner_layers: int = 1
    mlp_ratio: float = 4.0
    patch_size: int = 1
    patch_size_t: int = 1
    qk_norm: str = "rms_norm"
    rope_theta: float = 256.0
    rope_axes_dim: Tuple[int, ...] = (16, 56, 56)
    rope_spatial_grid_start_pos: Tuple[float, float] = (-499.5, 5.25)
    rope_spatial_grid_end_pos: Tuple[float, float] = (508.5, 353.25)
    spatial_deg2rad: bool = True
    conditioning_tensor_in_channels: int = 84
    conditioning_tensor_intermediate_proj_dim: Optional[int] = None
    conditioning_tensor_rope_axes_dim: Tuple[int, ...] = (16, 56, 56)
    incl_time_elapsed: bool = True
    nope: bool = False
    scale_attn_by_lat: bool = False
    # TPU-specific knobs (no reference equivalent)
    attention_impl: str = "auto"  # "auto" | "xla" | "pallas"
    # Opt-in dynamic w8a8 int8 quantization of the transformer-block
    # matmuls (ops/quant.py; the v5e int8 MXU path has 2x bf16
    # throughput). Approximate — validate on trained weights before
    # production use, like RolloutConfig.correction_skip_period.
    int8_matmuls: bool = False
    # Per-block gradient checkpointing (nn.remat on every dual-/single-
    # stream block): block boundaries are saved, block internals
    # (attention, MLP) recomputed at backward time. Parity with the
    # reference's gradient_checkpointing, which wraps the same blocks via
    # torch.utils.checkpoint (LaDCast_3D_model.py:979-1010). Training-only;
    # no effect on inference.
    remat: bool = False

    def __post_init__(self):
        object.__setattr__(self, "rope_axes_dim", _tup(self.rope_axes_dim))
        object.__setattr__(self, "rope_spatial_grid_start_pos", _tup(self.rope_spatial_grid_start_pos))
        object.__setattr__(self, "rope_spatial_grid_end_pos", _tup(self.rope_spatial_grid_end_pos))
        object.__setattr__(self, "conditioning_tensor_rope_axes_dim", _tup(self.conditioning_tensor_rope_axes_dim))
        assert sum(self.rope_axes_dim) == self.attention_head_dim
        assert sum(self.conditioning_tensor_rope_axes_dim) == self.attention_head_dim

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def cond_intermediate_dim(self) -> int:
        d = self.conditioning_tensor_intermediate_proj_dim
        return self.inner_dim if d is None else d

    def rope_spatial_grid_start_rad(self) -> Tuple[float, float]:
        if self.spatial_deg2rad:
            return tuple(math.radians(v) for v in self.rope_spatial_grid_start_pos)
        return self.rope_spatial_grid_start_pos

    def rope_spatial_grid_end_rad(self) -> Tuple[float, float]:
        if self.spatial_deg2rad:
            return tuple(math.radians(v) for v in self.rope_spatial_grid_end_pos)
        return self.rope_spatial_grid_end_pos


def ladcast_375m_config(**overrides) -> LaDCastDiTConfig:
    """configs/ladcast_375M.yaml:2-31."""
    return LaDCastDiTConfig(**overrides)


def dcae_ray_1024_config(**overrides) -> DCAEConfig:
    """The Ray trainer's scaled-up DCAE (configs/DC_AE_ray_1024.yaml):
    widths (512, 1024, 1024, 2048), 1024 latent channels, 90 input
    channels (+geopotential_at_surface), 6 static channels."""
    base = dict(
        in_channels=90, out_channels=90, latent_channels=1024,
        encoder_block_out_channels=(512, 1024, 1024, 2048),
        decoder_block_out_channels=(512, 1024, 1024, 2048),
        static_channels=6)
    base.update(overrides)
    return DCAEConfig(**base)


def ladcast_1p6b_config(**overrides) -> LaDCastDiTConfig:
    """configs/ladcast_1.6B.yaml:2-31."""
    base = dict(num_attention_heads=16, num_layers=5, num_single_layers=10,
                num_refiner_layers=3)
    base.update(overrides)
    return LaDCastDiTConfig(**base)


@dataclass(frozen=True)
class EDMSchedulerConfig:
    """diffusers.EDMDPMSolverMultistepScheduler-equivalent settings.

    Defaults match the reference usage: sigma_data=0.5,
    num_train_timesteps=1000 (evaluate/pred_rollout.py:49-52,
    configs/ladcast_375M.yaml:33-36).
    """

    sigma_min: float = 0.002
    sigma_max: float = 80.0
    sigma_data: float = 0.5
    num_train_timesteps: int = 1000
    rho: float = 7.0
    solver_order: int = 2
    prediction_type: str = "epsilon"
    solver_type: str = "midpoint"
    final_sigmas_type: str = "zero"


@dataclass(frozen=True)
class NoiseSamplerConfig:
    """Karras_sigmas_lognormal settings (models/utils.py:9-50 +
    configs/ladcast_375M.yaml:38-42)."""

    P_mean_start: float = -1.2
    P_std_start: float = 1.2
    P_mean_end: float = -1.2
    P_std_end: float = 1.2
    num_max_steps: int = 50000


@dataclass(frozen=True)
class RolloutConfig:
    """Ensemble AR rollout settings (README.md:124-149 defaults)."""

    ensemble_size: int = 20
    num_inference_steps: int = 20
    return_seq_len: int = 4
    input_seq_len: int = 1
    total_lead_time_hour: int = 240
    step_size_hour: int = 6
    noise_level: float = 0.0
    latent_target_std: float = 0.5
    sampler_type: str = "edm"  # "edm" (Heun) or "dpm" (multistep pipeline)
    # Initial-noise scale for the "dpm" sampler: None = sigma_max (the
    # mathematically consistent start); 1.0 reproduces the reference
    # "pipeline" sampler exactly, which starts from UNSCALED unit noise
    # (pipeline_AR.py:77-85; see diffusion/samplers.py docstring).
    dpm_init_scale: float | None = None
    trajectory_dtype: str = "float32"
    # Opt-in approximate acceleration: extrapolate every skipped Heun
    # correction eval from the last evaluated one (samplers.py docstring;
    # 0/1 = exact reference path). Validate skill before production use.
    correction_skip_period: int = 0

    @property
    def total_num_steps(self) -> int:
        assert self.total_lead_time_hour % self.step_size_hour == 0
        return self.total_lead_time_hour // self.step_size_hour

    @property
    def num_repetitions(self) -> int:
        return -(-self.total_num_steps // self.return_seq_len)


def config_to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)


def config_from_dict(cls, d: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in d.items() if k in names})
