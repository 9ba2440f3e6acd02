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
        self._shim_config = FrozenDict(kwargs)


def register_to_config(init):
    @functools.wraps(init)
    def wrapped(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        init(self, *args, **kwargs)
        object.__setattr__(self, "_shim_config", FrozenDict(cfg))
    return wrapped


class ModelMixin(nn.Module):
    pass


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
        scale_lora_layers=_noop, unscale_lora_layers=_noop)
    mod("diffusers.utils.torch_utils",
        maybe_allow_in_graph=_identity_decorator)
    mod("diffusers.utils.accelerate_utils",
        apply_forward_hook=_identity_decorator)
    root.__shim__ = True
