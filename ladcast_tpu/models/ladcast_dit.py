"""LaDCast AR diffusion transformer, TPU-native (flax.linen).

Architecture parity with the reference ``LaDCastTransformer3DModel``
(/root/reference/ladcast/models/LaDCast_3D_model.py:569-1071), a
HunyuanVideo-derived dual-stream/single-stream DiT over latent frames:

  latent (B, T, 15, 30, 84) + conditioning latent (B, T_in, 15, 30, 84)
  -> 1x1x1 patch embeds -> conditioning token refiner (self-attn blocks)
  -> N dual-stream blocks (separate QKV, joint attention)
  -> M single-stream blocks (concatenated streams, parallel MLP)
  -> AdaLN-continuous output head -> (B, T, 15, 30, 84)

Conditioning: EDM c_noise + pooled-conditioning AdaLN-Zero modulation,
optional year-progress FiLM, 3-axis grid-valued RoPE (frame index /
latitude rad / longitude rad; conditioning frames get temporal coords <= 0,
prediction frames 1..T -- LaDCast_3D_model.py:884-938).

Faithfully reproduced quirks (weights depend on them):
  * Dual-stream attention applies RoPE to the latent stream only; the
    conditioning stream's Q/K enter the joint attention un-rotated
    (processor lines 166-190).
  * Single-stream and refiner attentions have no output projection
    (``pre_only=True``).
  * temb (time/text embed + year FiLM) computed in float32
    (LaDCast_3D_model.py:953-973).

Native layouts: tokens (B, S, D); attention BSHD. Frames enter as
(B, T, H, W, C) (channels-last; the reference's (B, C, T, H, W) transposed
at the boundary).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ladcast_tpu.config import LaDCastDiTConfig
from ladcast_tpu.ops import rope as rope_ops
from ladcast_tpu.ops.embeddings import timestep_embedding, year_sincos_embedding
from ladcast_tpu.ops.norms import layer_norm
from ladcast_tpu.ops.quant import QuantizableDense as QDense


# ---------------------------------------------------------------------------
# Small shared pieces
# ---------------------------------------------------------------------------

class LayerNormLayer(nn.Module):
    eps: float
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        w = b = None
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (dim,), jnp.float32)
            b = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return layer_norm(x, w, b, self.eps)


class TimestepEmbedder(nn.Module):
    """diffusers TimestepEmbedding: Linear -> SiLU -> Linear."""

    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, name="linear_1")(x)
        return nn.Dense(self.dim, name="linear_2")(nn.silu(x))


class CombinedTimestepTextProj(nn.Module):
    """diffusers CombinedTimestepTextProjEmbeddings: 256-dim sinusoid of the
    (c_noise) timestep through an MLP, plus a projected pooled embedding."""

    dim: int

    @nn.compact
    def __call__(self, timestep, pooled):
        t = timestep_embedding(timestep, 256, flip_sin_to_cos=True,
                               downscale_freq_shift=0.0)
        t_emb = TimestepEmbedder(self.dim, name="timestep_embedder")(
            t.astype(pooled.dtype))
        p = nn.Dense(self.dim, name="text_embedder_linear_1")(pooled)
        p = nn.Dense(self.dim, name="text_embedder_linear_2")(nn.silu(p))
        return t_emb + p


class FeedForwardGelu(nn.Module):
    """diffusers FeedForward(activation_fn='gelu-approximate')."""

    mult: float = 4.0
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = int(dim * self.mult)
        h = QDense(inner, quant=self.int8, name="proj_in")(x)
        h = nn.gelu(h, approximate=True)
        return QDense(dim, quant=self.int8, name="proj_out")(h)


class FeedForwardLinearSilu(nn.Module):
    """diffusers FeedForward(activation_fn='linear-silu') (refiner MLP)."""

    mult: float = 4.0

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = int(dim * self.mult)
        h = nn.silu(nn.Dense(inner, name="proj_in")(x))
        return nn.Dense(dim, name="proj_out")(h)


def _split_heads(x, num_heads):  # (B,S,H*D) -> (B,S,H,D)
    B, S, _ = x.shape
    return x.reshape(B, S, num_heads, -1)


def _merge_heads(x):  # (B,S,H,D) -> (B,S,H*D)
    B, S, H, D = x.shape
    return x.reshape(B, S, H * D)


# ---------------------------------------------------------------------------
# Attention variants
#
# All three variants funnel into one fused primitive:
# RMS-norm(Q,K) -> rotary -> flash attention
# (ladcast_tpu.ops.attention.norm_rope_attention). Per-position tables
# express the reference's segment asymmetries exactly:
#   - dual-stream: latent segment rotated, conditioning segment identity
#     rows with its own norm weights (LaDCast_3D_model.py:166-190)
#   - single-stream: both segments rotated with their own tables
#     (:112-141)
#   - refiner: one segment, conditioning tables (:289-294)
# ---------------------------------------------------------------------------

def _norm_weight(module: nn.Module, name: str, dim: int):
    """Per-head qk-norm affine weight (diffusers RMSNorm(dim_head,
    eps=1e-7), weight-only). Parameter path matches the reference
    (attn/<name>/weight) for checkpoint import."""
    return module.param(f"{name}_weight", nn.initializers.ones, (dim,),
                        jnp.float32)


def _segment_tables(segments):
    """Build (S, D) cos/sin/weight tables from a list of segments, each
    (length, rope_table_or_None, weight_vector)."""
    cos_parts, sin_parts, w_parts = [], [], []
    for length, table, w in segments:
        if table is None:
            d = w.shape[-1]
            cos_parts.append(jnp.ones((length, d), jnp.float32))
            sin_parts.append(jnp.zeros((length, d), jnp.float32))
        else:
            cos_parts.append(table[0][:length])
            sin_parts.append(table[1][:length])
        w_parts.append(jnp.broadcast_to(w[None], (length, w.shape[-1])))
    if len(cos_parts) == 1:
        return cos_parts[0], sin_parts[0], w_parts[0]
    return (jnp.concatenate(cos_parts), jnp.concatenate(sin_parts),
            jnp.concatenate(w_parts))


class JointAttention(nn.Module):
    """Dual-stream joint attention (diffusers Attention with
    added_kv_proj_dim; processor branch LaDCast_3D_model.py:166-190).

    RoPE is applied to the latent stream only; the conditioning stream is
    qk-normed with its own weights and enters un-rotated.
    """

    num_heads: int
    head_dim: int
    attention_impl: str = "auto"
    int8: bool = False

    @nn.compact
    def __call__(self, x, cond, rope_table, attn_bias=None):
        from ladcast_tpu.ops.attention import norm_rope_attention

        inner = self.num_heads * self.head_dim
        n_lat, n_cond = x.shape[1], cond.shape[1]
        q = _split_heads(QDense(inner, quant=self.int8, name="to_q")(x), self.num_heads)
        k = _split_heads(QDense(inner, quant=self.int8, name="to_k")(x), self.num_heads)
        v = _split_heads(QDense(inner, quant=self.int8, name="to_v")(x), self.num_heads)
        cq = _split_heads(QDense(inner, quant=self.int8, name="add_q_proj")(cond), self.num_heads)
        ck = _split_heads(QDense(inner, quant=self.int8, name="add_k_proj")(cond), self.num_heads)
        cv = _split_heads(QDense(inner, quant=self.int8, name="add_v_proj")(cond), self.num_heads)

        wq = _norm_weight(self, "norm_q", self.head_dim)
        wk = _norm_weight(self, "norm_k", self.head_dim)
        wcq = _norm_weight(self, "norm_added_q", self.head_dim)
        wck = _norm_weight(self, "norm_added_k", self.head_dim)

        qcos, qsin, qw = _segment_tables(
            [(n_lat, rope_table, wq), (n_cond, None, wcq)])
        kcos, ksin, kw = _segment_tables(
            [(n_lat, rope_table, wk), (n_cond, None, wck)])

        qj = jnp.concatenate([q, cq], axis=1)
        kj = jnp.concatenate([k, ck], axis=1)
        vj = jnp.concatenate([v, cv], axis=1)
        out = norm_rope_attention(qj, kj, vj, qcos, qsin, qw, kcos, ksin,
                                  kw, bias=attn_bias,
                                  impl=self.attention_impl)
        out = _merge_heads(out).astype(x.dtype)

        x_out, c_out = out[:, :-n_cond], out[:, -n_cond:]
        x_out = QDense(inner, quant=self.int8, name="to_out")(x_out)
        c_out = QDense(inner, quant=self.int8, name="to_add_out")(c_out)
        return x_out, c_out


class ConcatStreamAttention(nn.Module):
    """Single-stream attention: shared QKV over [latent; cond] tokens with
    per-part RoPE, no output projection (pre_only=True; processor branch
    LaDCast_3D_model.py:112-141)."""

    num_heads: int
    head_dim: int
    attention_impl: str = "auto"
    int8: bool = False

    @nn.compact
    def __call__(self, x, cond, rope_table, cond_rope_table, attn_bias=None):
        from ladcast_tpu.ops.attention import norm_rope_attention

        inner = self.num_heads * self.head_dim
        n_lat, n_cond = x.shape[1], cond.shape[1]
        h = jnp.concatenate([x, cond], axis=1)
        q = _split_heads(QDense(inner, quant=self.int8, name="to_q")(h), self.num_heads)
        k = _split_heads(QDense(inner, quant=self.int8, name="to_k")(h), self.num_heads)
        v = _split_heads(QDense(inner, quant=self.int8, name="to_v")(h), self.num_heads)

        wq = _norm_weight(self, "norm_q", self.head_dim)
        wk = _norm_weight(self, "norm_k", self.head_dim)
        qcos, qsin, qw = _segment_tables(
            [(n_lat, rope_table, wq), (n_cond, cond_rope_table, wq)])
        kcos, ksin, kw = _segment_tables(
            [(n_lat, rope_table, wk), (n_cond, cond_rope_table, wk)])

        out = norm_rope_attention(q, k, v, qcos, qsin, qw, kcos, ksin, kw,
                                  bias=attn_bias, impl=self.attention_impl)
        out = _merge_heads(out).astype(x.dtype)
        return out[:, :-n_cond], out[:, -n_cond:]


class SelfAttentionPreOnly(nn.Module):
    """Refiner self-attention: QKV + qk-norm + RoPE on all tokens, no
    output projection (pre_only=True)."""

    num_heads: int
    head_dim: int
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, rope_table, attn_bias=None):
        from ladcast_tpu.ops.attention import norm_rope_attention

        inner = self.num_heads * self.head_dim
        n = x.shape[1]
        q = _split_heads(nn.Dense(inner, name="to_q")(x), self.num_heads)
        k = _split_heads(nn.Dense(inner, name="to_k")(x), self.num_heads)
        v = _split_heads(nn.Dense(inner, name="to_v")(x), self.num_heads)
        wq = _norm_weight(self, "norm_q", self.head_dim)
        wk = _norm_weight(self, "norm_k", self.head_dim)
        qcos, qsin, qw = _segment_tables([(n, rope_table, wq)])
        kcos, ksin, kw = _segment_tables([(n, rope_table, wk)])
        out = norm_rope_attention(q, k, v, qcos, qsin, qw, kcos, ksin, kw,
                                  bias=attn_bias, impl=self.attention_impl)
        return _merge_heads(out).astype(x.dtype)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

class AdaLayerNormZero(nn.Module):
    """diffusers AdaLayerNormZero: SiLU -> Linear(6*dim); LN(eps=1e-6,
    no affine); returns modulated x + 4 gates/mods."""

    @nn.compact
    def __call__(self, x, temb):
        dim = x.shape[-1]
        e = nn.Dense(6 * dim, name="linear")(nn.silu(temb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            jnp.split(e, 6, axis=-1)
        h = layer_norm(x, None, None, 1e-6)
        h = h * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return h, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroSingle(nn.Module):
    """diffusers AdaLayerNormZeroSingle: SiLU -> Linear(3*dim)."""

    @nn.compact
    def __call__(self, x, temb):
        dim = x.shape[-1]
        e = nn.Dense(3 * dim, name="linear")(nn.silu(temb))
        shift_msa, scale_msa, gate = jnp.split(e, 3, axis=-1)
        h = layer_norm(x, None, None, 1e-6)
        h = h * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return h, gate


class RefinerBlock(nn.Module):
    """LaDCastIndividualTokenRefinerBlock (LaDCast_3D_model.py:241-302)."""

    num_heads: int
    head_dim: int
    mlp_ratio: float = 4.0
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, temb, rope_table, attn_bias=None):
        dim = self.num_heads * self.head_dim
        h = LayerNormLayer(eps=1e-7, name="norm1")(x)
        attn_out = SelfAttentionPreOnly(
            self.num_heads, self.head_dim, self.attention_impl,
            name="attn")(h, rope_table, attn_bias)

        gates = nn.Dense(2 * dim, name="norm_out_linear")(nn.silu(temb))
        gate_msa, gate_mlp = jnp.split(gates, 2, axis=-1)
        x = x + attn_out * gate_msa[:, None]

        ff = FeedForwardLinearSilu(self.mlp_ratio, name="ff")(
            LayerNormLayer(eps=1e-7, name="norm2")(x))
        return x + ff * gate_mlp[:, None]


class TokenRefiner(nn.Module):
    """LaDCastTokenRefiner (LaDCast_3D_model.py:345-390)."""

    in_channels: int
    num_heads: int
    head_dim: int
    num_layers: int
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, timestep, rope_table, attn_bias=None):
        dim = self.num_heads * self.head_dim
        pooled = x.mean(axis=1)
        temb = CombinedTimestepTextProj(dim, name="time_text_embed")(
            timestep, pooled)
        h = nn.Dense(dim, name="proj_in")(x)
        for i in range(self.num_layers):
            h = RefinerBlock(self.num_heads, self.head_dim,
                             attention_impl=self.attention_impl,
                             name=f"refiner_blocks_{i}")(
                h, temb, rope_table, attn_bias)
        return h


class DualStreamBlock(nn.Module):
    """LaDCastTransformerBlock (LaDCast_3D_model.py:472-566)."""

    num_heads: int
    head_dim: int
    mlp_ratio: float
    attention_impl: str = "auto"
    int8: bool = False

    @nn.compact
    def __call__(self, x, cond, temb, rope_table, attn_bias=None):
        norm_x, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            AdaLayerNormZero(name="norm1")(x, temb)
        norm_c, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = \
            AdaLayerNormZero(name="norm1_context")(cond, temb)

        attn_x, attn_c = JointAttention(
            self.num_heads, self.head_dim, self.attention_impl, self.int8,
            name="attn")(norm_x, norm_c, rope_table, attn_bias)

        x = x + attn_x * gate_msa[:, None]
        cond = cond + attn_c * c_gate_msa[:, None]

        nx = layer_norm(x, None, None, 1e-7)
        nx = nx * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
        nc = layer_norm(cond, None, None, 1e-7)
        nc = nc * (1 + c_scale_mlp[:, None]) + c_shift_mlp[:, None]

        x = x + FeedForwardGelu(self.mlp_ratio, self.int8, name="ff")(nx) \
            * gate_mlp[:, None]
        cond = cond + FeedForwardGelu(self.mlp_ratio, self.int8,
                                      name="ff_context")(nc) \
            * c_gate_mlp[:, None]
        return x, cond


class SingleStreamBlock(nn.Module):
    """LaDCastSingleTransformerBlock (LaDCast_3D_model.py:394-468)."""

    num_heads: int
    head_dim: int
    mlp_ratio: float
    attention_impl: str = "auto"
    int8: bool = False

    @nn.compact
    def __call__(self, x, cond, temb, rope_table, cond_rope_table,
                 attn_bias=None):
        dim = self.num_heads * self.head_dim
        mlp_dim = int(dim * self.mlp_ratio)
        n_cond = cond.shape[1]
        h = jnp.concatenate([x, cond], axis=1)
        residual = h

        norm_h, gate = AdaLayerNormZeroSingle(name="norm")(h, temb)
        mlp_h = nn.gelu(QDense(mlp_dim, quant=self.int8,
                               name="proj_mlp")(norm_h),
                        approximate=True)

        attn_x, attn_c = ConcatStreamAttention(
            self.num_heads, self.head_dim, self.attention_impl, self.int8,
            name="attn")(norm_h[:, :-n_cond], norm_h[:, -n_cond:],
                         rope_table, cond_rope_table, attn_bias)
        attn_out = jnp.concatenate([attn_x, attn_c], axis=1)

        h = jnp.concatenate([attn_out, mlp_h], axis=2)
        h = gate[:, None] * QDense(dim, quant=self.int8, name="proj_out")(h)
        h = h + residual
        return h[:, :-n_cond], h[:, -n_cond:]


# ---------------------------------------------------------------------------
# Top-level model
# ---------------------------------------------------------------------------

class LaDCastTransformer3D(nn.Module):
    """The AR diffusion transformer.

    __call__(latents, c_noise, conditioning, year_progress):
      latents:       (B, T, H, W, C)  preconditioned noisy prediction frames
      c_noise:       (B,) or (1,)     EDM preconditioned noise level
      conditioning:  (B, T_in, H, W, C) conditioning latent frames
      year_progress: (B,) float in [0,1) or None
    returns (B, T, H, W, C_out) raw network output F(x) (caller applies
    EDM output preconditioning).
    """

    cfg: LaDCastDiTConfig

    def _rope_tables(self, num_frames: int, height: int, width: int,
                     conditioning: bool):
        cfg = self.cfg
        if cfg.nope:
            # Temporal-only RoPE over full head_dim, repeated per spatial
            # position (LaDCast_3D_model.py:897-917).
            if conditioning:
                t = np.arange(-num_frames + 1, 1, dtype=np.float32)
            else:
                t = np.arange(1, num_frames + 1, dtype=np.float32)
            cos, sin = rope_ops.rotary_tables_1d(
                cfg.attention_head_dim, t, cfg.rope_theta)
            cos = np.repeat(cos, height * width, axis=0)
            sin = np.repeat(sin, height * width, axis=0)
        else:
            lat0, lon0 = cfg.rope_spatial_grid_start_rad()
            lat1, lon1 = cfg.rope_spatial_grid_end_rad()
            coords = rope_ops.ladcast_axis_coords(
                num_frames, height, width, lat0, lat1, lon0, lon1,
                conditioning=conditioning)
            dims = (cfg.conditioning_tensor_rope_axes_dim if conditioning
                    else cfg.rope_axes_dim)
            cos, sin = rope_ops.multi_axis_rotary_tables(
                dims, coords, cfg.rope_theta)
        return jnp.asarray(cos), jnp.asarray(sin)

    def _lat_attn_bias(self, seq_frames: int, height: int, width: int):
        """scale_attn_by_lat additive bias (LaDCast_3D_model.py:682-693,
        873-882): normalized cos-lat weights per key position."""
        from ladcast_tpu.metrics.weights import cos_lat_weights
        lat = np.linspace(-83.25, 84.75, height)
        w = cos_lat_weights(lat)
        w = w / w.sum()
        w = np.repeat(w, width)  # (H*W,)
        w = np.tile(w, seq_frames)
        return jnp.asarray(w, jnp.float32)[None, None, None, :]

    @nn.compact
    def __call__(self, latents, c_noise, conditioning, year_progress=None):
        cfg = self.cfg
        B, T, H, W, C = latents.shape
        T_in = conditioning.shape[1]
        p, pt = cfg.patch_size, cfg.patch_size_t
        assert p == 1 and pt == 1, "shipped configs use 1x1x1 patches"
        inner = cfg.inner_dim

        c_noise = jnp.broadcast_to(jnp.atleast_1d(c_noise), (B,))

        rope_table = None if cfg.nope else self._rope_tables(T, H, W, False)
        cond_rope_table = self._rope_tables(T_in, H, W, True)
        if cfg.nope:
            rope_table = self._rope_tables(T, H, W, False)

        if cfg.scale_attn_by_lat:
            pred_bias = self._lat_attn_bias(T + T_in, H, W)
            cond_bias = self._lat_attn_bias(T_in, H, W)
        else:
            pred_bias = cond_bias = None

        # 1. Patch embeds (1x1x1 conv3d == Dense over channels).
        x = nn.Dense(inner, name="x_embedder")(latents.reshape(B, T * H * W, C))
        cond = nn.Dense(inner, name="context_embedder")(
            conditioning.reshape(B, T_in * H * W, C))

        # 2. Conditioning refinement + temb (fp32 island, ref :953-973).
        cond = TokenRefiner(
            cfg.cond_intermediate_dim, cfg.num_attention_heads,
            cfg.attention_head_dim, cfg.num_refiner_layers,
            attention_impl=cfg.attention_impl,
            name="context_refiner")(cond, c_noise, cond_rope_table, cond_bias)

        pooled = cond.mean(axis=1).astype(jnp.float32)
        temb = CombinedTimestepTextProj(inner, name="time_text_embed")(
            c_noise.astype(jnp.float32), pooled)
        if year_progress is not None and cfg.incl_time_elapsed:
            ye = year_sincos_embedding(
                jnp.broadcast_to(jnp.atleast_1d(year_progress), (B,)), 256)
            ye = TimestepEmbedder(2 * inner, name="time_elapsed_embed")(ye)
            scale, shift = jnp.split(ye, 2, axis=-1)
            temb = temb * (1 + scale) + shift
        temb = temb.astype(latents.dtype)

        # 3+4. Dual-/single-stream blocks. With cfg.remat each block is a
        # jax.checkpoint boundary (per-block gradient checkpointing, the
        # reference's torch.utils.checkpoint wrap of the same blocks,
        # LaDCast_3D_model.py:979-1010): only the (x, cond) residual
        # streams are saved; attention/MLP internals are recomputed at
        # backward time. Parameter names/paths are unchanged by nn.remat.
        DSB = nn.remat(DualStreamBlock) if cfg.remat else DualStreamBlock
        SSB = nn.remat(SingleStreamBlock) if cfg.remat else SingleStreamBlock
        for i in range(cfg.num_layers):
            x, cond = DSB(
                cfg.num_attention_heads, cfg.attention_head_dim,
                cfg.mlp_ratio, cfg.attention_impl, cfg.int8_matmuls,
                name=f"transformer_blocks_{i}")(
                    x, cond, temb, rope_table, pred_bias)

        for i in range(cfg.num_single_layers):
            x, cond = SSB(
                cfg.num_attention_heads, cfg.attention_head_dim,
                cfg.mlp_ratio, cfg.attention_impl, cfg.int8_matmuls,
                name=f"single_transformer_blocks_{i}")(
                    x, cond, temb, rope_table, cond_rope_table, pred_bias)

        # 5. AdaLN-continuous head (scale chunked first, diffusers
        # AdaLayerNormContinuous) + projection + unpatchify.
        e = nn.Dense(2 * inner, name="norm_out_linear")(nn.silu(temb))
        scale, shift = jnp.split(e, 2, axis=-1)
        x = layer_norm(x, None, None, 1e-7)
        x = x * (1 + scale[:, None]) + shift[:, None]
        x = nn.Dense(pt * p * p * cfg.out_channels, name="proj_out")(x)
        return x.reshape(B, T, H, W, cfg.out_channels)
