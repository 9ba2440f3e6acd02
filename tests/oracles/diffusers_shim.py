"""Minimal torch implementations of the diffusers v0.32.1 pieces the
reference LaDCast model files import, so those files can be executed
UNMODIFIED from /root/reference as parity oracles in an image that has no
diffusers install.

Every formula here is transcribed from the public diffusers v0.32.1
source (Apache-2.0):
  - models/embeddings.py   (get_timestep_embedding, Timesteps,
    TimestepEmbedding, PixArtAlphaTextProjection,
    CombinedTimestepTextProjEmbeddings, get_1d_rotary_pos_embed,
    apply_rotary_emb)
  - models/normalization.py (RMSNorm, FP32LayerNorm, AdaLayerNormZero,
    AdaLayerNormZeroSingle, AdaLayerNormContinuous, get_normalization)
  - models/attention.py     (FeedForward, GELU, LinearActivation)
  - models/attention_processor.py (Attention -- only the argument
    combinations the reference instantiates)
  - models/activations.py   (get_activation)

Test-support code only; nothing in ladcast_tpu imports this.
"""

from __future__ import annotations

import functools
import inspect
import logging as _stdlib_logging
import math
import sys
import types
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

# ---------------------------------------------------------------------------
# configuration_utils / modeling_utils / loaders
# ---------------------------------------------------------------------------


class FrozenDict(dict):
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)


class ConfigMixin:
    @property
    def config(self):
        return self._shim_config

    def register_to_config(self, **kwargs):
        # diffusers merges repeated registrations into the existing config
        # (the EDM scheduler amends algorithm_type/solver_type in __init__)
        merged = dict(getattr(self, "_shim_config", {}))
        merged.update(kwargs)
        object.__setattr__(self, "_shim_config", FrozenDict(merged))


def register_to_config(init):
    # diffusers registers the config BEFORE running the wrapped __init__
    # body (the EDM scheduler reads self.config inside __init__)
    @functools.wraps(init)
    def wrapped(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        object.__setattr__(self, "_shim_config", FrozenDict(cfg))
        init(self, *args, **kwargs)
    return wrapped


class ModelMixin(nn.Module):
    def save_pretrained(self, save_directory: str):
        # diffusers ModelMixin.save_pretrained hub layout: config.json
        # (register_to_config args + _class_name) next to
        # diffusion_pytorch_model.safetensors
        import json
        import os

        from safetensors.torch import save_file

        os.makedirs(save_directory, exist_ok=True)
        cfg = {"_class_name": self.__class__.__name__,
               "_diffusers_version": "0.32.1"}
        cfg.update(self._shim_config)
        with open(os.path.join(save_directory, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2, default=list)
        save_file(
            {k: v.contiguous() for k, v in self.state_dict().items()},
            os.path.join(save_directory,
                         "diffusion_pytorch_model.safetensors"))

    @property
    def dtype(self) -> torch.dtype:
        # diffusers ModelMixin.dtype: dtype of the first parameter
        for p in self.parameters():
            return p.dtype
        return torch.float32

    @property
    def device(self) -> torch.device:
        for p in self.parameters():
            return p.device
        return torch.device("cpu")


class FromOriginalModelMixin:
    pass


class PeftAdapterMixin:
    pass


@dataclass
class Transformer2DModelOutput:
    sample: torch.Tensor


@dataclass
class EncoderOutput:
    latent: torch.Tensor


@dataclass
class DecoderOutput:
    sample: torch.Tensor


class AutoencoderMixin:
    pass


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------

_ACTIVATIONS = {
    "swish": nn.SiLU,
    "silu": nn.SiLU,
    "mish": nn.Mish,
    "gelu": nn.GELU,
    "relu": nn.ReLU,
    "relu6": nn.ReLU6,
}


def get_activation(act_fn: str) -> nn.Module:
    return _ACTIVATIONS[act_fn.lower()]()


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


class RMSNorm(nn.Module):
    # diffusers.models.normalization.RMSNorm (v0.32.1)
    def __init__(self, dim, eps: float, elementwise_affine: bool = True,
                 bias: bool = False):
        super().__init__()
        self.eps = eps
        self.weight = None
        self.bias = None
        if elementwise_affine:
            self.weight = nn.Parameter(torch.ones(dim))
            if bias:
                self.bias = nn.Parameter(torch.zeros(dim))

    def forward(self, hidden_states):
        input_dtype = hidden_states.dtype
        variance = hidden_states.to(torch.float32).pow(2).mean(-1, keepdim=True)
        hidden_states = hidden_states * torch.rsqrt(variance + self.eps)
        if self.weight is not None:
            if self.weight.dtype in (torch.float16, torch.bfloat16):
                hidden_states = hidden_states.to(self.weight.dtype)
            hidden_states = hidden_states * self.weight
            if self.bias is not None:
                hidden_states = hidden_states + self.bias
        else:
            hidden_states = hidden_states.to(input_dtype)
        return hidden_states


class FP32LayerNorm(nn.LayerNorm):
    def forward(self, inputs):
        origin_dtype = inputs.dtype
        return F.layer_norm(
            inputs.float(),
            self.normalized_shape,
            self.weight.float() if self.weight is not None else None,
            self.bias.float() if self.bias is not None else None,
            self.eps,
        ).to(origin_dtype)


def get_normalization(norm_type: str = "batch_norm",
                      num_features: Optional[int] = None,
                      eps: float = 1e-5, elementwise_affine: bool = True,
                      bias: bool = True) -> nn.Module:
    if norm_type == "rms_norm":
        return RMSNorm(num_features, eps=eps,
                       elementwise_affine=elementwise_affine, bias=bias)
    if norm_type == "layer_norm":
        return nn.LayerNorm(num_features, eps=eps,
                            elementwise_affine=elementwise_affine, bias=bias)
    if norm_type == "batch_norm":
        return nn.BatchNorm2d(num_features, eps=eps, affine=elementwise_affine)
    raise ValueError(norm_type)


class AdaLayerNormZero(nn.Module):
    def __init__(self, embedding_dim: int, num_embeddings=None,
                 norm_type: str = "layer_norm", bias: bool = True):
        super().__init__()
        assert num_embeddings is None
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, 6 * embedding_dim, bias=bias)
        assert norm_type == "layer_norm"
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False,
                                 eps=1e-6)

    def forward(self, x, timestep=None, class_labels=None, hidden_dtype=None,
                emb=None):
        emb = self.linear(self.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            emb.chunk(6, dim=1)
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroSingle(nn.Module):
    def __init__(self, embedding_dim: int, norm_type: str = "layer_norm",
                 bias: bool = True):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(embedding_dim, 3 * embedding_dim, bias=bias)
        assert norm_type == "layer_norm"
        self.norm = nn.LayerNorm(embedding_dim, elementwise_affine=False,
                                 eps=1e-6)

    def forward(self, x, emb=None):
        emb = self.linear(self.silu(emb))
        shift_msa, scale_msa, gate_msa = emb.chunk(3, dim=1)
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa


class AdaLayerNormContinuous(nn.Module):
    def __init__(self, embedding_dim: int, conditioning_embedding_dim: int,
                 elementwise_affine: bool = True, eps: float = 1e-5,
                 bias: bool = True, norm_type: str = "layer_norm"):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(conditioning_embedding_dim,
                                embedding_dim * 2, bias=bias)
        assert norm_type == "layer_norm"
        self.norm = nn.LayerNorm(embedding_dim, eps, elementwise_affine, bias)

    def forward(self, x, conditioning_embedding):
        emb = self.linear(self.silu(conditioning_embedding).to(x.dtype))
        scale, shift = torch.chunk(emb, 2, dim=1)
        x = self.norm(x) * (1 + scale)[:, None, :] + shift[:, None, :]
        return x


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------


def get_timestep_embedding(timesteps, embedding_dim: int,
                           flip_sin_to_cos: bool = False,
                           downscale_freq_shift: float = 1,
                           scale: float = 1, max_period: int = 10000):
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        start=0, end=half_dim, dtype=torch.float32, device=timesteps.device)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = F.pad(emb, (0, 1, 0, 0))
    return emb


class Timesteps(nn.Module):
    def __init__(self, num_channels: int, flip_sin_to_cos: bool,
                 downscale_freq_shift: float, scale: int = 1):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift
        self.scale = scale

    def forward(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift, scale=self.scale)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels: int, time_embed_dim: int,
                 act_fn: str = "silu", out_dim: int = None,
                 post_act_fn: Optional[str] = None, cond_proj_dim=None,
                 sample_proj_bias=True):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim,
                                  sample_proj_bias)
        assert cond_proj_dim is None and post_act_fn is None
        self.act = get_activation(act_fn)
        time_embed_dim_out = out_dim if out_dim is not None else time_embed_dim
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim_out,
                                  sample_proj_bias)

    def forward(self, sample, condition=None):
        sample = self.linear_1(sample)
        sample = self.act(sample)
        sample = self.linear_2(sample)
        return sample


class PixArtAlphaTextProjection(nn.Module):
    def __init__(self, in_features, hidden_size, out_features=None,
                 act_fn="gelu_tanh"):
        super().__init__()
        if out_features is None:
            out_features = hidden_size
        self.linear_1 = nn.Linear(in_features, hidden_size, bias=True)
        if act_fn == "gelu_tanh":
            self.act_1 = nn.GELU(approximate="tanh")
        elif act_fn == "silu":
            self.act_1 = nn.SiLU()
        else:
            raise ValueError(act_fn)
        self.linear_2 = nn.Linear(hidden_size, out_features, bias=True)

    def forward(self, caption):
        return self.linear_2(self.act_1(self.linear_1(caption)))


class CombinedTimestepTextProjEmbeddings(nn.Module):
    def __init__(self, embedding_dim, pooled_projection_dim):
        super().__init__()
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(
            in_channels=256, time_embed_dim=embedding_dim)
        self.text_embedder = PixArtAlphaTextProjection(
            pooled_projection_dim, embedding_dim, act_fn="silu")

    def forward(self, timestep, pooled_projection):
        timesteps_proj = self.time_proj(timestep)
        timesteps_emb = self.timestep_embedder(
            timesteps_proj.to(dtype=pooled_projection.dtype))
        pooled_projections = self.text_embedder(pooled_projection)
        return timesteps_emb + pooled_projections


def get_1d_rotary_pos_embed(dim: int, pos, theta: float = 10000.0,
                            use_real=False, linear_factor=1.0,
                            ntk_factor=1.0, repeat_interleave_real=True,
                            freqs_dtype=torch.float32):
    assert dim % 2 == 0
    if isinstance(pos, int):
        pos = torch.arange(pos)
    if isinstance(pos, np.ndarray):
        pos = torch.from_numpy(pos)
    theta = theta * ntk_factor
    freqs = (1.0 / (theta ** (torch.arange(0, dim, 2, dtype=freqs_dtype,
                                           device=pos.device)[: dim // 2]
                              / dim)) / linear_factor)
    freqs = torch.outer(pos, freqs)
    if use_real and repeat_interleave_real:
        freqs_cos = freqs.cos().repeat_interleave(2, dim=1).float()
        freqs_sin = freqs.sin().repeat_interleave(2, dim=1).float()
        return freqs_cos, freqs_sin
    if use_real:
        freqs_cos = torch.cat([freqs.cos(), freqs.cos()], dim=-1).float()
        freqs_sin = torch.cat([freqs.sin(), freqs.sin()], dim=-1).float()
        return freqs_cos, freqs_sin
    return torch.polar(torch.ones_like(freqs), freqs)


def apply_rotary_emb(x, freqs_cis, use_real: bool = True,
                     use_real_unbind_dim: int = -1):
    if use_real:
        cos, sin = freqs_cis
        cos = cos[None, None]
        sin = sin[None, None]
        cos, sin = cos.to(x.device), sin.to(x.device)
        if use_real_unbind_dim == -1:
            x_real, x_imag = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
            x_rotated = torch.stack([-x_imag, x_real], dim=-1).flatten(3)
        elif use_real_unbind_dim == -2:
            x_real, x_imag = x.reshape(*x.shape[:-1], 2, -1).unbind(-2)
            x_rotated = torch.cat([-x_imag, x_real], dim=-1)
        else:
            raise ValueError(use_real_unbind_dim)
        return (x.float() * cos + x_rotated.float() * sin).to(x.dtype)
    raise NotImplementedError


# ---------------------------------------------------------------------------
# attention (FeedForward + Attention)
# ---------------------------------------------------------------------------


class GELU(nn.Module):
    def __init__(self, dim_in, dim_out, approximate="none", bias=True):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)
        self.approximate = approximate

    def forward(self, hidden_states):
        return F.gelu(self.proj(hidden_states), approximate=self.approximate)


class LinearActivation(nn.Module):
    def __init__(self, dim_in, dim_out, bias=True, activation="silu"):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out, bias=bias)
        self.activation = get_activation(activation)

    def forward(self, hidden_states):
        return self.activation(self.proj(hidden_states))


class FeedForward(nn.Module):
    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                 activation_fn="geglu", final_dropout=False, inner_dim=None,
                 bias=True):
        super().__init__()
        if inner_dim is None:
            inner_dim = int(dim * mult)
        dim_out = dim_out if dim_out is not None else dim
        if activation_fn == "gelu":
            act_fn = GELU(dim, inner_dim, bias=bias)
        elif activation_fn == "gelu-approximate":
            act_fn = GELU(dim, inner_dim, approximate="tanh", bias=bias)
        elif activation_fn == "linear-silu":
            act_fn = LinearActivation(dim, inner_dim, bias=bias,
                                      activation="silu")
        else:
            raise ValueError(activation_fn)
        self.net = nn.ModuleList([])
        self.net.append(act_fn)
        self.net.append(nn.Dropout(dropout))
        self.net.append(nn.Linear(inner_dim, dim_out, bias=bias))
        if final_dropout:
            self.net.append(nn.Dropout(dropout))

    def forward(self, hidden_states, *args, **kwargs):
        for module in self.net:
            hidden_states = module(hidden_states)
        return hidden_states


class Attention(nn.Module):
    """diffusers Attention limited to the configurations the reference
    builds: qk_norm in (None, 'rms_norm'), cross_attention_dim=None,
    optional added_kv_proj_dim / pre_only / context_pre_only."""

    def __init__(self, query_dim: int, cross_attention_dim=None,
                 heads: int = 8, dim_head: int = 64, dropout: float = 0.0,
                 bias: bool = False, qk_norm=None, added_kv_proj_dim=None,
                 added_proj_bias=True, out_bias: bool = True,
                 eps: float = 1e-5, out_dim: int = None,
                 context_pre_only=None, pre_only=False, processor=None,
                 **unused):
        super().__init__()
        self.inner_dim = out_dim if out_dim is not None else dim_head * heads
        self.query_dim = query_dim
        self.cross_attention_dim = (cross_attention_dim
                                    if cross_attention_dim is not None
                                    else query_dim)
        self.heads = out_dim // dim_head if out_dim is not None else heads
        self.out_dim = out_dim if out_dim is not None else query_dim
        self.context_pre_only = context_pre_only
        self.pre_only = pre_only
        self.added_kv_proj_dim = added_kv_proj_dim
        self.scale = dim_head**-0.5

        if qk_norm is None:
            self.norm_q = None
            self.norm_k = None
        elif qk_norm == "rms_norm":
            self.norm_q = RMSNorm(dim_head, eps=eps)
            self.norm_k = RMSNorm(dim_head, eps=eps)
        else:
            raise ValueError(qk_norm)

        self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_k = nn.Linear(self.cross_attention_dim, self.inner_dim,
                              bias=bias)
        self.to_v = nn.Linear(self.cross_attention_dim, self.inner_dim,
                              bias=bias)

        if added_kv_proj_dim is not None:
            self.add_k_proj = nn.Linear(added_kv_proj_dim, self.inner_dim,
                                        bias=added_proj_bias)
            self.add_v_proj = nn.Linear(added_kv_proj_dim, self.inner_dim,
                                        bias=added_proj_bias)
            if self.context_pre_only is not None:
                self.add_q_proj = nn.Linear(added_kv_proj_dim, self.inner_dim,
                                            bias=added_proj_bias)
            if qk_norm == "rms_norm":
                self.norm_added_q = RMSNorm(dim_head, eps=eps)
                self.norm_added_k = RMSNorm(dim_head, eps=eps)
        else:
            self.add_q_proj = None
            self.add_k_proj = None
            self.add_v_proj = None
            self.norm_added_q = None
            self.norm_added_k = None

        if not self.pre_only:
            self.to_out = nn.ModuleList(
                [nn.Linear(self.inner_dim, self.out_dim, bias=out_bias),
                 nn.Dropout(dropout)])

        if added_kv_proj_dim is not None and context_pre_only is not None \
                and not context_pre_only:
            self.to_add_out = nn.Linear(self.inner_dim, self.out_dim,
                                        bias=out_bias)

        self.processor = processor

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **cross_attention_kwargs):
        params = set(
            inspect.signature(self.processor.__call__).parameters.keys())
        kwargs = {k: v for k, v in cross_attention_kwargs.items()
                  if k in params}
        return self.processor(self, hidden_states,
                              encoder_hidden_states=encoder_hidden_states,
                              attention_mask=attention_mask, **kwargs)


class AttentionProcessor:
    pass


# ---------------------------------------------------------------------------
# torch_utils.randn_tensor (diffusers/utils/torch_utils.py v0.32.1)
# ---------------------------------------------------------------------------


def randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
    """Per-batch-member generator semantics: a list of generators draws each
    member's noise independently (the reference's reproducible-ensemble
    contract, pipelines/utils.py:703-705)."""
    rand_device = device
    batch_size = shape[0]

    layout = layout or torch.strided
    device = device or torch.device("cpu")

    if generator is not None:
        gen_device_type = (generator.device.type if not isinstance(generator, list)
                           else generator[0].device.type)
        if gen_device_type != device.type and gen_device_type == "cpu":
            rand_device = "cpu"
        elif gen_device_type != device.type and gen_device_type == "cuda":
            raise ValueError(
                f"Cannot generate a {device} tensor from a generator of type "
                f"{gen_device_type}.")

    if isinstance(generator, list) and len(generator) == 1:
        generator = generator[0]

    if isinstance(generator, list):
        shape = (1,) + tuple(shape[1:])
        latents = [
            torch.randn(shape, generator=generator[i], device=rand_device,
                        dtype=dtype, layout=layout)
            for i in range(batch_size)
        ]
        latents = torch.cat(latents, dim=0).to(device)
    else:
        latents = torch.randn(shape, generator=generator, device=rand_device,
                              dtype=dtype, layout=layout).to(device)

    return latents


# ---------------------------------------------------------------------------
# EDMDPMSolverMultistepScheduler
# (diffusers/schedulers/scheduling_edm_dpmsolver_multistep.py v0.32.1)
# ---------------------------------------------------------------------------


@dataclass
class SchedulerOutput:
    prev_sample: torch.Tensor


class SchedulerMixin:
    pass


class EDMDPMSolverMultistepScheduler(SchedulerMixin, ConfigMixin):
    """Transcription of the public diffusers v0.32.1 scheduler the
    reference depends on (instantiated `diffusers.EDMDPMSolverMultistep
    Scheduler(sigma_data=0.5, num_train_timesteps=1000)` at reference
    pred_rollout.py:49-52 / configs/ladcast_375M.yaml:33-36; consumed by
    pipelines/edm_sampler.py, pipelines/pipeline_AR.py, models/utils.py
    and train_AR.py:911-977)."""

    order = 1

    @register_to_config
    def __init__(
        self,
        sigma_min: float = 0.002,
        sigma_max: float = 80.0,
        sigma_data: float = 0.5,
        sigma_schedule: str = "karras",
        num_train_timesteps: int = 1000,
        prediction_type: str = "epsilon",
        rho: float = 7.0,
        solver_order: int = 2,
        thresholding: bool = False,
        dynamic_thresholding_ratio: float = 0.995,
        sample_max_value: float = 1.0,
        algorithm_type: str = "dpmsolver++",
        solver_type: str = "midpoint",
        lower_order_final: bool = True,
        euler_at_final: bool = False,
        final_sigmas_type: Optional[str] = "zero",
    ):
        # settings for DPM-Solver
        if algorithm_type not in ["dpmsolver++", "sde-dpmsolver++"]:
            if algorithm_type in ["deis"]:
                self.register_to_config(algorithm_type="dpmsolver++")
            else:
                raise NotImplementedError(
                    f"{algorithm_type} is not implemented for {self.__class__}")

        if solver_type not in ["midpoint", "heun"]:
            if solver_type in ["logrho", "bh1", "bh2"]:
                self.register_to_config(solver_type="midpoint")
            else:
                raise NotImplementedError(
                    f"{solver_type} is not implemented for {self.__class__}")

        if algorithm_type not in ["dpmsolver++", "sde-dpmsolver++"] \
                and final_sigmas_type == "zero":
            raise ValueError(
                f"`final_sigmas_type` {final_sigmas_type} is not supported "
                f"for `algorithm_type` {algorithm_type}.")

        ramp = torch.linspace(0, 1, num_train_timesteps)
        if sigma_schedule == "karras":
            sigmas = self._compute_karras_sigmas(ramp)
        elif sigma_schedule == "exponential":
            sigmas = self._compute_exponential_sigmas(ramp)

        self.timesteps = self.precondition_noise(sigmas)

        self.sigmas = torch.cat([sigmas, torch.zeros(1, device=sigmas.device)])

        # setable values
        self.num_inference_steps = None
        self.model_outputs = [None] * solver_order
        self.lower_order_nums = 0
        self._step_index = None
        self._begin_index = None
        self.sigmas = self.sigmas.to("cpu")

    @property
    def init_noise_sigma(self):
        # standard deviation of the initial noise distribution
        return (self.config.sigma_max**2 + 1) ** 0.5

    @property
    def step_index(self):
        return self._step_index

    @property
    def begin_index(self):
        return self._begin_index

    def set_begin_index(self, begin_index: int = 0):
        self._begin_index = begin_index

    def precondition_inputs(self, sample, sigma):
        c_in = 1 / ((sigma**2 + self.config.sigma_data**2) ** 0.5)
        scaled_sample = sample * c_in
        return scaled_sample

    def precondition_noise(self, sigma):
        if not isinstance(sigma, torch.Tensor):
            sigma = torch.tensor([sigma])

        c_noise = 0.25 * torch.log(sigma)

        return c_noise

    def precondition_outputs(self, sample, model_output, sigma):
        sigma_data = self.config.sigma_data
        c_skip = sigma_data**2 / (sigma**2 + sigma_data**2)

        if self.config.prediction_type == "epsilon":
            c_out = sigma * sigma_data / (sigma**2 + sigma_data**2) ** 0.5
        elif self.config.prediction_type == "v_prediction":
            c_out = -sigma * sigma_data / (sigma**2 + sigma_data**2) ** 0.5
        else:
            raise ValueError(
                f"Prediction type {self.config.prediction_type} is not supported.")

        denoised = c_skip * sample + c_out * model_output

        return denoised

    def scale_model_input(self, sample, timestep):
        if self.step_index is None:
            self._init_step_index(timestep)

        sigma = self.sigmas[self.step_index]
        sample = self.precondition_inputs(sample, sigma)

        self.is_scale_input_called = True
        return sample

    def set_timesteps(self, num_inference_steps: int = None, device=None):
        self.num_inference_steps = num_inference_steps

        ramp = torch.linspace(0, 1, self.num_inference_steps)
        if self.config.sigma_schedule == "karras":
            sigmas = self._compute_karras_sigmas(ramp)
        elif self.config.sigma_schedule == "exponential":
            sigmas = self._compute_exponential_sigmas(ramp)

        sigmas = sigmas.to(dtype=torch.float32, device=device)
        self.timesteps = self.precondition_noise(sigmas)

        if self.config.final_sigmas_type == "sigma_min":
            sigma_last = self.config.sigma_min
        elif self.config.final_sigmas_type == "zero":
            sigma_last = 0
        else:
            raise ValueError(
                "`final_sigmas_type` must be one of 'zero', or 'sigma_min', "
                f"but got {self.config.final_sigmas_type}")

        self.sigmas = torch.cat(
            [sigmas, torch.full((1,), fill_value=sigma_last,
                                device=sigmas.device)])

        self.model_outputs = [None] * self.config.solver_order
        self.lower_order_nums = 0

        # add an index counter for schedulers that allow duplicated timesteps
        self._step_index = None
        self._begin_index = None
        self.sigmas = self.sigmas.to("cpu")

    def _compute_karras_sigmas(self, ramp, sigma_min=None, sigma_max=None
                               ) -> torch.Tensor:
        """Constructs the noise schedule of Karras et al. (2022)."""
        sigma_min = sigma_min or self.config.sigma_min
        sigma_max = sigma_max or self.config.sigma_max

        rho = self.config.rho
        min_inv_rho = sigma_min ** (1 / rho)
        max_inv_rho = sigma_max ** (1 / rho)
        sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
        return sigmas

    def _compute_exponential_sigmas(self, ramp, sigma_min=None, sigma_max=None
                                    ) -> torch.Tensor:
        sigma_min = sigma_min or self.config.sigma_min
        sigma_max = sigma_max or self.config.sigma_max
        sigmas = torch.linspace(math.log(sigma_min), math.log(sigma_max),
                                len(ramp)).exp().flip(0)
        return sigmas

    def _threshold_sample(self, sample):
        dtype = sample.dtype
        batch_size, channels, *remaining_dims = sample.shape

        if dtype not in (torch.float32, torch.float64):
            sample = sample.float()

        sample = sample.reshape(batch_size,
                                channels * int(np.prod(remaining_dims)))

        abs_sample = sample.abs()

        s = torch.quantile(abs_sample,
                           self.config.dynamic_thresholding_ratio, dim=1)
        s = torch.clamp(s, min=1, max=self.config.sample_max_value)
        s = s.unsqueeze(1)
        sample = torch.clamp(sample, -s, s) / s

        sample = sample.reshape(batch_size, channels, *remaining_dims)
        sample = sample.to(dtype)

        return sample

    def _sigma_to_t(self, sigma):
        return 0.25 * sigma.log()

    def _sigma_to_alpha_sigma_t(self, sigma):
        alpha_t = torch.tensor(1)  # Inputs are pre-scaled before going into
        # unet, so alpha_t = 1
        sigma_t = sigma

        return alpha_t, sigma_t

    def convert_model_output(self, model_output, sample=None):
        sigma = self.sigmas[self.step_index]
        x0_pred = self.precondition_outputs(sample, model_output, sigma)

        if self.config.thresholding:
            x0_pred = self._threshold_sample(x0_pred)

        return x0_pred

    def dpm_solver_first_order_update(self, model_output, sample=None,
                                      noise=None):
        sigma_t, sigma_s = self.sigmas[self.step_index + 1], \
            self.sigmas[self.step_index]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t)
        alpha_s, sigma_s = self._sigma_to_alpha_sigma_t(sigma_s)
        lambda_t = torch.log(alpha_t) - torch.log(sigma_t)
        lambda_s = torch.log(alpha_s) - torch.log(sigma_s)

        h = lambda_t - lambda_s
        if self.config.algorithm_type == "dpmsolver++":
            x_t = (sigma_t / sigma_s) * sample - \
                (alpha_t * (torch.exp(-h) - 1.0)) * model_output
        elif self.config.algorithm_type == "sde-dpmsolver++":
            assert noise is not None
            x_t = (
                (sigma_t / sigma_s * torch.exp(-h)) * sample
                + (alpha_t * (1 - torch.exp(-2.0 * h))) * model_output
                + sigma_t * torch.sqrt(1.0 - torch.exp(-2 * h)) * noise
            )

        return x_t

    def multistep_dpm_solver_second_order_update(self, model_output_list,
                                                 sample=None, noise=None):
        sigma_t, sigma_s0, sigma_s1 = (
            self.sigmas[self.step_index + 1],
            self.sigmas[self.step_index],
            self.sigmas[self.step_index - 1],
        )

        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t)
        alpha_s0, sigma_s0 = self._sigma_to_alpha_sigma_t(sigma_s0)
        alpha_s1, sigma_s1 = self._sigma_to_alpha_sigma_t(sigma_s1)

        lambda_t = torch.log(alpha_t) - torch.log(sigma_t)
        lambda_s0 = torch.log(alpha_s0) - torch.log(sigma_s0)
        lambda_s1 = torch.log(alpha_s1) - torch.log(sigma_s1)

        m0, m1 = model_output_list[-1], model_output_list[-2]

        h, h_0 = lambda_t - lambda_s0, lambda_s0 - lambda_s1
        r0 = h_0 / h
        D0, D1 = m0, (1.0 / r0) * (m0 - m1)
        if self.config.algorithm_type == "dpmsolver++":
            # See https://arxiv.org/abs/2211.01095 for detailed derivations
            if self.config.solver_type == "midpoint":
                x_t = (
                    (sigma_t / sigma_s0) * sample
                    - (alpha_t * (torch.exp(-h) - 1.0)) * D0
                    - 0.5 * (alpha_t * (torch.exp(-h) - 1.0)) * D1
                )
            elif self.config.solver_type == "heun":
                x_t = (
                    (sigma_t / sigma_s0) * sample
                    - (alpha_t * (torch.exp(-h) - 1.0)) * D0
                    + (alpha_t * ((torch.exp(-h) - 1.0) / h + 1.0)) * D1
                )
        elif self.config.algorithm_type == "sde-dpmsolver++":
            assert noise is not None
            if self.config.solver_type == "midpoint":
                x_t = (
                    (sigma_t / sigma_s0 * torch.exp(-h)) * sample
                    + (alpha_t * (1 - torch.exp(-2.0 * h))) * D0
                    + 0.5 * (alpha_t * (1 - torch.exp(-2.0 * h))) * D1
                    + sigma_t * torch.sqrt(1.0 - torch.exp(-2 * h)) * noise
                )
            elif self.config.solver_type == "heun":
                x_t = (
                    (sigma_t / sigma_s0 * torch.exp(-h)) * sample
                    + (alpha_t * (1 - torch.exp(-2.0 * h))) * D0
                    + (alpha_t * ((1.0 - torch.exp(-2.0 * h)) / (-2.0 * h)
                                  + 1.0)) * D1
                    + sigma_t * torch.sqrt(1.0 - torch.exp(-2 * h)) * noise
                )

        return x_t

    def multistep_dpm_solver_third_order_update(self, model_output_list,
                                                sample=None):
        sigma_t, sigma_s0, sigma_s1, sigma_s2 = (
            self.sigmas[self.step_index + 1],
            self.sigmas[self.step_index],
            self.sigmas[self.step_index - 1],
            self.sigmas[self.step_index - 2],
        )

        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t)
        alpha_s0, sigma_s0 = self._sigma_to_alpha_sigma_t(sigma_s0)
        alpha_s1, sigma_s1 = self._sigma_to_alpha_sigma_t(sigma_s1)
        alpha_s2, sigma_s2 = self._sigma_to_alpha_sigma_t(sigma_s2)

        lambda_t = torch.log(alpha_t) - torch.log(sigma_t)
        lambda_s0 = torch.log(alpha_s0) - torch.log(sigma_s0)
        lambda_s1 = torch.log(alpha_s1) - torch.log(sigma_s1)
        lambda_s2 = torch.log(alpha_s2) - torch.log(sigma_s2)

        m0, m1, m2 = model_output_list[-1], model_output_list[-2], \
            model_output_list[-3]

        h, h_0, h_1 = lambda_t - lambda_s0, lambda_s0 - lambda_s1, \
            lambda_s1 - lambda_s2
        r0, r1 = h_0 / h, h_1 / h
        D0 = m0
        D1_0, D1_1 = (1.0 / r0) * (m0 - m1), (1.0 / r1) * (m1 - m2)
        D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
        D2 = (1.0 / (r0 + r1)) * (D1_0 - D1_1)

        if self.config.algorithm_type == "dpmsolver++":
            x_t = (
                (sigma_t / sigma_s0) * sample
                - (alpha_t * (torch.exp(-h) - 1.0)) * D0
                + (alpha_t * ((torch.exp(-h) - 1.0) / h + 1.0)) * D1
                - (alpha_t * ((torch.exp(-h) - 1.0 + h) / h**2 - 0.5)) * D2
            )
        else:
            raise NotImplementedError(self.config.algorithm_type)

        return x_t

    def index_for_timestep(self, timestep, schedule_timesteps=None):
        if schedule_timesteps is None:
            schedule_timesteps = self.timesteps

        index_candidates = (schedule_timesteps == timestep).nonzero()

        if len(index_candidates) == 0:
            step_index = len(self.timesteps) - 1
        # The sigma index that is taken for the **very** first `step`
        # is always the second index (or the last index if there is only 1)
        # This way we can ensure we don't accidentally skip a sigma in
        # case we start in the middle of the denoising schedule (e.g. for
        # image-to-image)
        elif len(index_candidates) > 1:
            step_index = index_candidates[1].item()
        else:
            step_index = index_candidates[0].item()

        return step_index

    def _init_step_index(self, timestep):
        if self.begin_index is None:
            if isinstance(timestep, torch.Tensor):
                timestep = timestep.to(self.timesteps.device)
            self._step_index = self.index_for_timestep(timestep)
        else:
            self._step_index = self._begin_index

    def step(self, model_output, timestep, sample, generator=None,
             return_dict: bool = True):
        if self.num_inference_steps is None:
            raise ValueError(
                "Number of inference steps is 'None', you need to run "
                "'set_timesteps' after creating the scheduler")

        if self.step_index is None:
            self._init_step_index(timestep)

        # Improve numerical stability for small number of steps
        lower_order_final = (self.step_index == len(self.timesteps) - 1) and (
            self.config.euler_at_final
            or (self.config.lower_order_final and len(self.timesteps) < 15)
            or self.config.final_sigmas_type == "zero"
        )
        lower_order_second = (
            (self.step_index == len(self.timesteps) - 2)
            and self.config.lower_order_final and len(self.timesteps) < 15
        )

        model_output = self.convert_model_output(model_output, sample=sample)
        for i in range(self.config.solver_order - 1):
            self.model_outputs[i] = self.model_outputs[i + 1]
        self.model_outputs[-1] = model_output

        if self.config.algorithm_type == "sde-dpmsolver++":
            noise = randn_tensor(
                model_output.shape, generator=generator,
                device=model_output.device, dtype=torch.float32)
        else:
            noise = None

        if self.config.solver_order == 1 or self.lower_order_nums < 1 \
                or lower_order_final:
            prev_sample = self.dpm_solver_first_order_update(
                model_output, sample=sample, noise=noise)
        elif self.config.solver_order == 2 or self.lower_order_nums < 2 \
                or lower_order_second:
            prev_sample = self.multistep_dpm_solver_second_order_update(
                self.model_outputs, sample=sample, noise=noise)
        else:
            prev_sample = self.multistep_dpm_solver_third_order_update(
                self.model_outputs, sample=sample)

        if self.lower_order_nums < self.config.solver_order:
            self.lower_order_nums += 1

        # upon completion increase step index by one
        self._step_index += 1

        if not return_dict:
            return (prev_sample,)

        return SchedulerOutput(prev_sample=prev_sample)

    def add_noise(self, original_samples, noise, timesteps):
        sigmas = self.sigmas.to(device=original_samples.device,
                                dtype=original_samples.dtype)
        schedule_timesteps = self.timesteps.to(original_samples.device)
        timesteps = timesteps.to(original_samples.device)

        # begin_index is None when the scheduler is used for training or
        # the pipeline does not implement set_begin_index
        if self.begin_index is None:
            step_indices = [self.index_for_timestep(t, schedule_timesteps)
                            for t in timesteps]
        elif self.step_index is not None:
            # add_noise is called after first denoising step (for inpainting)
            step_indices = [self.step_index] * timesteps.shape[0]
        else:
            # add noise is called before first denoising step to create
            # initial latent (img2img)
            step_indices = [self.begin_index] * timesteps.shape[0]

        sigma = sigmas[step_indices].flatten()
        while len(sigma.shape) < len(original_samples.shape):
            sigma = sigma.unsqueeze(-1)

        noisy_samples = original_samples + noise * sigma
        return noisy_samples

    def __len__(self):
        return self.config.num_train_timesteps


# ---------------------------------------------------------------------------
# pipeline_utils.DiffusionPipeline -- the minimal surface pipeline_AR.py
# touches (register_modules, _execution_device, dtype lookup)
# ---------------------------------------------------------------------------


class DiffusionPipeline(ConfigMixin):
    def __init__(self):
        super().__init__()
        if not hasattr(self, "_shim_config"):
            object.__setattr__(self, "_shim_config", FrozenDict({}))
        self._shim_modules = {}

    def register_modules(self, **kwargs):
        for name, module in kwargs.items():
            setattr(self, name, module)
            self._shim_modules[name] = module
        self.register_to_config(
            **{k: (type(v).__name__ if v is not None else None)
               for k, v in kwargs.items()})

    @property
    def _execution_device(self):
        for module in self._shim_modules.values():
            if isinstance(module, nn.Module):
                for p in module.parameters():
                    return p.device
        return torch.device("cpu")

    @property
    def device(self):
        return self._execution_device


class BaseOutput:
    """Light stand-in for diffusers BaseOutput: dataclass subclasses get
    attribute access (native) plus tuple-style integer indexing."""

    def __getitem__(self, k):
        if isinstance(k, int):
            return list(self.__dict__.values())[k]
        return getattr(self, k)

    def to_tuple(self):
        return tuple(self.__dict__.values())


class _SchedulerType:
    pass


def get_cosine_schedule_with_warmup(optimizer, num_warmup_steps,
                                    num_training_steps, num_cycles=0.5,
                                    last_epoch=-1):
    """Transcribed from public diffusers v0.32.1 optimization.py
    (Apache-2.0), like the rest of this shim."""
    from torch.optim.lr_scheduler import LambdaLR

    def lr_lambda(current_step):
        if current_step < num_warmup_steps:
            return float(current_step) / float(max(1, num_warmup_steps))
        progress = float(current_step - num_warmup_steps) / float(
            max(1, num_training_steps - num_warmup_steps))
        return max(0.0, 0.5 * (1.0 + math.cos(
            math.pi * float(num_cycles) * 2.0 * progress)))

    return LambdaLR(optimizer, lr_lambda, last_epoch)


def get_polynomial_decay_schedule_with_warmup(optimizer, num_warmup_steps,
                                              num_training_steps,
                                              lr_end=1e-7, power=1.0,
                                              last_epoch=-1):
    """Transcribed from public diffusers v0.32.1 optimization.py
    (Apache-2.0)."""
    from torch.optim.lr_scheduler import LambdaLR

    lr_init = optimizer.defaults["lr"]
    if not (lr_init > lr_end):
        raise ValueError(
            f"lr_end ({lr_end}) must be smaller than initial lr ({lr_init})")

    def lr_lambda(current_step):
        if current_step < num_warmup_steps:
            return float(current_step) / float(max(1, num_warmup_steps))
        elif current_step > num_training_steps:
            return lr_end / lr_init  # as LambdaLR multiplies by lr_init
        else:
            lr_range = lr_init - lr_end
            decay_steps = num_training_steps - num_warmup_steps
            pct_remaining = 1 - (current_step - num_warmup_steps) / decay_steps
            decay = lr_range * pct_remaining ** power + lr_end
            return decay / lr_init  # as LambdaLR multiplies by lr_init

    return LambdaLR(optimizer, lr_lambda, last_epoch)


def get_scheduler(name, optimizer, step_rules=None, num_warmup_steps=None,
                  num_training_steps=None, num_cycles=1, power=1.0,
                  last_epoch=-1):
    """Minimal dispatcher covering the names the reference trainers use
    (train_AR.py:711, train_encdec.py:453: 'cosine'; plus 'polynomial'
    via the models/utils.py fallback branch)."""
    name = str(name)
    if name == "cosine":
        return get_cosine_schedule_with_warmup(
            optimizer, num_warmup_steps, num_training_steps,
            num_cycles=num_cycles, last_epoch=last_epoch)
    if name == "polynomial":
        return get_polynomial_decay_schedule_with_warmup(
            optimizer, num_warmup_steps, num_training_steps,
            power=power, last_epoch=last_epoch)
    raise NotImplementedError(
        f"scheduler {name!r} is not part of the oracle shim")


# ---------------------------------------------------------------------------
# utils
# ---------------------------------------------------------------------------


def is_torch_version(operation: str, version: str) -> bool:
    import operator
    from packaging.version import parse
    ops = {"<": operator.lt, "<=": operator.le, "==": operator.eq,
           ">": operator.gt, ">=": operator.ge, "!=": operator.ne}
    return ops[operation](parse(torch.__version__.split("+")[0]),
                          parse(version))


class _Logging:
    @staticmethod
    def get_logger(name=None):
        return _stdlib_logging.getLogger(name)


def _identity_decorator(fn):
    return fn


def _noop(*args, **kwargs):
    return None


def install():
    """Register the shim under the ``diffusers`` names in sys.modules."""
    if "diffusers" in sys.modules and getattr(
            sys.modules["diffusers"], "__shim__", False):
        return

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        m.__shim__ = True
        sys.modules[name] = m
        return m

    root = mod("diffusers")
    mod("diffusers.configuration_utils", ConfigMixin=ConfigMixin,
        register_to_config=register_to_config, FrozenDict=FrozenDict)
    mod("diffusers.loaders", FromOriginalModelMixin=FromOriginalModelMixin,
        PeftAdapterMixin=PeftAdapterMixin)
    mod("diffusers.models")
    mod("diffusers.models.activations", get_activation=get_activation,
        GELU=GELU, LinearActivation=LinearActivation)
    mod("diffusers.models.attention", FeedForward=FeedForward)
    mod("diffusers.models.attention_processor", Attention=Attention,
        AttentionProcessor=AttentionProcessor)
    mod("diffusers.models.embeddings",
        get_timestep_embedding=get_timestep_embedding, Timesteps=Timesteps,
        TimestepEmbedding=TimestepEmbedding,
        PixArtAlphaTextProjection=PixArtAlphaTextProjection,
        CombinedTimestepTextProjEmbeddings=CombinedTimestepTextProjEmbeddings,
        get_1d_rotary_pos_embed=get_1d_rotary_pos_embed,
        apply_rotary_emb=apply_rotary_emb)
    mod("diffusers.models.modeling_outputs",
        Transformer2DModelOutput=Transformer2DModelOutput)
    mod("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    mod("diffusers.models.normalization", RMSNorm=RMSNorm,
        FP32LayerNorm=FP32LayerNorm, get_normalization=get_normalization,
        AdaLayerNormZero=AdaLayerNormZero,
        AdaLayerNormZeroSingle=AdaLayerNormZeroSingle,
        AdaLayerNormContinuous=AdaLayerNormContinuous)
    mod("diffusers.models.autoencoders")
    mod("diffusers.models.autoencoders.vae", EncoderOutput=EncoderOutput,
        DecoderOutput=DecoderOutput, AutoencoderMixin=AutoencoderMixin)
    mod("diffusers.utils", USE_PEFT_BACKEND=False,
        is_torch_version=is_torch_version, logging=_Logging,
        scale_lora_layers=_noop, unscale_lora_layers=_noop,
        BaseOutput=BaseOutput)
    mod("diffusers.utils.torch_utils",
        maybe_allow_in_graph=_identity_decorator,
        randn_tensor=randn_tensor)
    mod("diffusers.utils.accelerate_utils",
        apply_forward_hook=_identity_decorator)
    mod("diffusers.schedulers",
        EDMDPMSolverMultistepScheduler=EDMDPMSolverMultistepScheduler)
    mod("diffusers.schedulers.scheduling_utils",
        SchedulerMixin=SchedulerMixin, SchedulerOutput=SchedulerOutput)
    mod("diffusers.pipelines")
    mod("diffusers.pipelines.pipeline_utils",
        DiffusionPipeline=DiffusionPipeline)
    mod("diffusers.optimization",
        SchedulerType=_SchedulerType, get_scheduler=get_scheduler,
        get_cosine_schedule_with_warmup=get_cosine_schedule_with_warmup,
        get_polynomial_decay_schedule_with_warmup=
        get_polynomial_decay_schedule_with_warmup)
    root.EDMDPMSolverMultistepScheduler = EDMDPMSolverMultistepScheduler
    root.DiffusionPipeline = DiffusionPipeline
    root.__shim__ = True
