"""Deep-Compression AutoEncoder (DCAE) for ERA5, TPU-native (flax.linen).

Architecture parity with the reference ``AutoencoderDC``
(/root/reference/ladcast/models/DCAE.py:735-1087) at the shipped
DC_AE_84_pretrain.yaml config: 89 input channels (84 dynamic + 5 static),
84-channel latent, 4 stages [ResBlock, ResBlock, EfficientViTBlock,
EfficientViTBlock] with widths (252, 504, 504, 1008), pixel
(un)shuffle up/downsampling with channel-averaging shortcuts, and
spherical-boundary 3x3 convolutions everywhere.

TPU-first deviations (semantics preserved, layout changed):
  * NHWC activations / HWIO kernels (XLA:TPU-native); the public
    ``encode``/``decode`` helpers accept either layout.
  * 1x1 convolutions are expressed as Dense over the channel axis; the
    grouped 1x1 in the multiscale attention projection is a block-diagonal
    einsum.
  * SphereConv2d's three-slice flipped-kernel evaluation becomes one
    uniform conv + two single-row corrections
    (:func:`ladcast_tpu.ops.sphere.sphere_conv2d`).

The SANA multiscale linear attention reproduces the reference/diffusers
channel regrouping *exactly*, including the quirk that the post-projection
reshape regroups (q,k,v) by contiguous 3*head_dim channel blocks rather
than by projection role (DCAE.py:239-243) -- published weights depend on it.

Timestep conditioning (``temb_channels``, DCAE.py:845-854) is wired in
for capability parity: ``encode``/``decode``/``__call__`` take an
optional ``time_elapsed`` (B,) that is sinusoid-embedded
(Timesteps(256) -> TimestepEmbedding, DCAE.py:1062-1066) and modulates
every ResBlock (scale/shift between the convs, DCAE.py:362-368) and
every EfficientViT attention (AdaLayerNormZero-style pre-norm + output
gate, DCAE.py:36-64, 189-197). No shipped config enables it
(configs/DC_AE_84_pretrain.yaml has no temb_channels); with
``temb_channels=None`` (default) the parameter tree and outputs are
byte-identical to the unconditioned model.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ladcast_tpu.config import DCAEConfig
from ladcast_tpu.ops.embeddings import timestep_embedding
from ladcast_tpu.ops.norms import rms_norm
from ladcast_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from ladcast_tpu.ops.sphere import sphere_conv2d


class SphereConv(nn.Module):
    """Spherical conv layer: owns an HWIO kernel (+ optional bias)."""

    out_channels: int
    kernel_size: int = 3
    use_bias: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, in_ch // self.groups, self.out_channels), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_channels,), jnp.float32)
                if self.use_bias else None)
        return sphere_conv2d(x, kernel.astype(x.dtype),
                             None if bias is None else bias.astype(x.dtype),
                             groups=self.groups)


class RMSNormLayer(nn.Module):
    eps: float = 1e-5
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (dim,), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
             if self.use_bias else None)
        return rms_norm(x, w, self.eps, b)


class ResBlock(nn.Module):
    """DCAE.py:327-377 (norm_type=rms_norm, act_fn=silu).

    With ``temb`` (B, K): scale/shift modulation between the convs from
    Linear(K, 2C) of the silu'd embedding (DCAE.py:351-352, 362-368;
    the reference passes temb through the block's own nonlinearity)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, temb=None):
        residual = x
        h = SphereConv(x.shape[-1], name="conv1")(x)
        h = nn.silu(h)
        if temb is not None:
            ss = nn.Dense(2 * self.out_channels,
                          name="time_emb_porj")(nn.silu(temb))
            scale, shift = jnp.split(ss, 2, axis=-1)
            h = h * scale[:, None, None, :] + shift[:, None, None, :]
        h = SphereConv(self.out_channels, use_bias=False, name="conv2")(h)
        h = RMSNormLayer(eps=1e-5, name="norm")(h)
        return h + residual


class GLUMBConv(nn.Module):
    """Gated inverted-bottleneck conv (DCAE.py:270-324)."""

    out_channels: int
    expand_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        residual = x
        hidden = int(self.expand_ratio * x.shape[-1])
        h = nn.Dense(2 * hidden, name="conv_inverted")(x)  # 1x1 conv
        h = nn.silu(h)
        h = SphereConv(2 * hidden, groups=2 * hidden, name="conv_depth")(h)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.silu(gate)
        h = nn.Dense(self.out_channels, use_bias=False, name="conv_point")(h)
        h = RMSNormLayer(eps=1e-7, name="norm")(h)
        return h + residual


class SanaMultiscaleProjection(nn.Module):
    """Depthwise sphere conv + grouped 1x1 (DCAE.py:67-93)."""

    num_heads: int
    kernel_size: int

    @nn.compact
    def __call__(self, qkv):
        ch = qkv.shape[-1]  # 3 * inner_dim
        h = SphereConv(ch, kernel_size=self.kernel_size, groups=ch,
                       use_bias=False, name="proj_in")(qkv)
        # grouped 1x1, groups = 3 * num_heads: block-diagonal dense.
        g = 3 * self.num_heads
        gs = ch // g
        w = self.param("proj_out_kernel", nn.initializers.lecun_normal(),
                       (g, gs, gs), jnp.float32)
        hg = h.reshape(*h.shape[:-1], g, gs)
        out = jnp.einsum("...gi,gio->...go", hg, w.astype(h.dtype))
        return out.reshape(*h.shape[:-1], ch)


class AdaLayerNormZeroSingle(nn.Module):
    """AdaLayerNormZeroSingle4Sana (DCAE.py:36-64): fp32 LayerNorm
    (eps 1e-15, no affine) modulated by SiLU -> Linear(C, 3C) of the
    projected temb; returns (x_modulated, gate)."""

    @nn.compact
    def __call__(self, x, emb):
        C = x.shape[-1]
        e = nn.Dense(3 * C, name="linear")(nn.silu(emb))
        shift, scale, gate = jnp.split(e, 3, axis=-1)
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-15)).astype(x.dtype)
        xm = (xn * (1.0 + scale[:, None, None, :])
              + shift[:, None, None, :])
        return xm, gate


class SanaMultiscaleLinearAttention(nn.Module):
    """DCAE.py:96-267 with residual_connection=True.

    ReLU linear attention over spatial tokens with the +1-pad
    normalization trick, computed in float32 (DCAE.py:158-175).

    With ``temb`` (B, K): AdaLayerNormZero pre-norm replaces the raw
    input (the residual then connects from the NORMED tensor, exactly
    the reference processor's residual placement, DCAE.py:189-197, 217)
    and the (B, C) gate multiplies the attention output after ``to_out``
    and before ``norm_out`` (DCAE.py:256-257).
    """

    out_channels: int
    attention_head_dim: int = 32
    kernel_sizes: Tuple[int, ...] = (5,)
    eps: float = 1e-15
    mult: float = 1.0

    @nn.compact
    def __call__(self, x, temb=None):
        B, H, W, C = x.shape
        hd = self.attention_head_dim
        num_heads = int(C // hd * self.mult)
        inner = num_heads * hd

        gate = None
        if temb is not None:
            t = nn.Dense(self.out_channels,
                         name="time_emb_porj")(nn.relu(temb))
            x, gate = AdaLayerNormZeroSingle(name="norm_in")(x, t)
        residual = x
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, name="to_v")(x)
        qkv = jnp.concatenate([q, k, v], axis=-1)  # (B,H,W,3*inner)

        scales = [qkv]
        for i, ks in enumerate(self.kernel_sizes):
            scales.append(SanaMultiscaleProjection(
                num_heads=num_heads, kernel_size=ks,
                name=f"to_qkv_multiscale_{i}")(qkv))
        full = jnp.concatenate(scales, axis=-1)  # (B,H,W,(1+n)*3*inner)

        # Channel regrouping identical to the reference reshape
        # (B, C, HW) -> (B, G, 3*hd, HW): contiguous 3*hd blocks become
        # (query, key, value) regardless of projection role.
        #
        # Precision: the reference upcasts the whole qkv tensor to fp32
        # (DCAE.py:162-175). In fp32 inputs (parity tests) that is exact
        # either way; in the bf16 production path we deliberately do NOT
        # upcast here -- the einsums below keep bf16 operands with fp32
        # ACCUMULATION (preferred_element_type) and fp32 normalization,
        # avoiding two full HBM passes over the (1+n)*3C tensor per block.
        G = full.shape[-1] // (3 * hd)
        t = full.reshape(B, H * W, G, 3 * hd)
        qg = nn.relu(t[..., :hd])
        kg = nn.relu(t[..., hd:2 * hd])
        vg = t[..., 2 * hd:]

        ones = jnp.ones((B, H * W, G, 1), dtype=vg.dtype)
        v_pad = jnp.concatenate([vg, ones], axis=-1)  # (B,N,G,hd+1)
        scores = jnp.einsum("bngi,bngj->bgij", v_pad, kg,
                            preferred_element_type=jnp.float32)
        out = jnp.einsum("bgij,bngj->bngi", scores.astype(full.dtype), qg,
                         preferred_element_type=jnp.float32)
        out = out[..., :hd] / (out[..., hd:] + self.eps)  # (B,N,G,hd)
        out = out.astype(x.dtype).reshape(B, H, W, G * hd)

        out = nn.Dense(self.out_channels, use_bias=False, name="to_out")(out)
        if gate is not None:
            out = out * gate[:, None, None, :]
        out = RMSNormLayer(eps=1e-5, name="norm_out")(out)
        return out + residual


class EfficientViTBlock(nn.Module):
    """DCAE.py:380-414: multiscale linear attention + GLUMBConv."""

    attention_head_dim: int = 32
    qkv_multiscales: Tuple[int, ...] = (5,)

    @nn.compact
    def __call__(self, x, temb=None):
        x = SanaMultiscaleLinearAttention(
            out_channels=x.shape[-1],
            attention_head_dim=self.attention_head_dim,
            kernel_sizes=self.qkv_multiscales, name="attn")(x, temb)
        x = GLUMBConv(out_channels=x.shape[-1], name="conv_out")(x)
        return x


class DCDownBlock(nn.Module):
    """Pixel-unshuffle downsample with channel-mean shortcut
    (DCAE.py:447-490, downsample=True)."""

    out_channels: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        factor = 2
        conv_out_ch = self.out_channels // (factor * factor)
        h = SphereConv(conv_out_ch, name="conv")(x)
        h = pixel_unshuffle(h, factor)
        if self.shortcut:
            group_size = in_ch * factor * factor // self.out_channels
            y = pixel_unshuffle(x, factor)
            y = y.reshape(*y.shape[:-1], self.out_channels, group_size).mean(-1)
            h = h + y
        return h


class DCUpBlock(nn.Module):
    """Pixel-shuffle upsample with repeat shortcut (DCAE.py:493-536,
    interpolate=False)."""

    out_channels: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        factor = 2
        h = SphereConv(self.out_channels * factor * factor, name="conv")(x)
        h = pixel_shuffle(h, factor)
        if self.shortcut:
            repeats = self.out_channels * factor * factor // in_ch
            y = jnp.repeat(x, repeats, axis=-1)
            y = pixel_shuffle(y, factor)
            h = h + y
        return h


def _make_block(block_type: str, channels: int, attention_head_dim: int,
                qkv_multiscales: Tuple[int, ...], name: str) -> nn.Module:
    if block_type == "ResBlock":
        return ResBlock(out_channels=channels, name=name)
    if block_type == "EfficientViTBlock":
        return EfficientViTBlock(attention_head_dim=attention_head_dim,
                                 qkv_multiscales=qkv_multiscales, name=name)
    raise ValueError(f"unsupported block type {block_type}")


class Encoder(nn.Module):
    """DCAE.py:539-631."""

    cfg: DCAEConfig

    @nn.compact
    def __call__(self, x, temb=None):
        cfg = self.cfg
        widths = cfg.encoder_block_out_channels
        n_stages = len(widths)
        assert cfg.encoder_layers_per_block[0] > 0

        h = SphereConv(widths[0], name="conv_in")(x)
        idx = 0
        for i, (width, n_layers) in enumerate(
                zip(widths, cfg.encoder_layers_per_block)):
            for _ in range(n_layers):
                h = _make_block(cfg.encoder_block_types[i], width,
                                cfg.attention_head_dim,
                                cfg.encoder_qkv_multiscales[i],
                                name=f"down_blocks_{idx}")(h, temb)
                idx += 1
            if i < n_stages - 1 and n_layers > 0:
                h = DCDownBlock(out_channels=widths[i + 1],
                                name=f"down_blocks_{idx}")(h)
                idx += 1

        z = SphereConv(cfg.latent_channels, name="conv_out")(h)
        if not cfg.encoder_out_shortcut:  # v2 option (DCAE_new.py:798)
            return z
        # out_shortcut: grouped channel average (DCAE.py:624-627)
        group = widths[-1] // cfg.latent_channels
        y = h.reshape(*h.shape[:-1], cfg.latent_channels, group).mean(-1)
        return z + y


class Decoder(nn.Module):
    """DCAE.py:634-732."""

    cfg: DCAEConfig

    @nn.compact
    def __call__(self, z, temb=None):
        cfg = self.cfg
        widths = cfg.decoder_block_out_channels
        n_stages = len(widths)
        assert cfg.decoder_layers_per_block[0] > 0

        h = SphereConv(widths[-1], name="conv_in")(z)
        if cfg.decoder_in_shortcut:  # v2 option (DCAE_new.py:799)
            repeats = widths[-1] // cfg.latent_channels
            h = h + jnp.repeat(z, repeats, axis=-1)  # in_shortcut

        idx = 0
        for i in reversed(range(n_stages)):
            width = widths[i]
            n_layers = cfg.decoder_layers_per_block[i]
            if i < n_stages - 1 and n_layers > 0:
                h = DCUpBlock(out_channels=width, name=f"up_blocks_{idx}")(h)
                idx += 1
            for _ in range(n_layers):
                h = _make_block(cfg.decoder_block_types[i], width,
                                cfg.attention_head_dim,
                                cfg.decoder_qkv_multiscales[i],
                                name=f"up_blocks_{idx}")(h, temb)
                idx += 1

        h = RMSNormLayer(eps=1e-7, name="norm_out")(h)
        # v2 option decoder_conv_act_fn (DCAE_new.py:677, default relu)
        act = {"relu": nn.relu, "silu": nn.silu, "relu6": nn.relu6,
               "gelu": nn.gelu, "identity": lambda x: x}[
            cfg.decoder_conv_act_fn]
        h = act(h)
        return SphereConv(cfg.out_channels, name="conv_out")(h)


class TimestepEmbedder(nn.Module):
    """Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0)
    followed by diffusers TimestepEmbedding (Linear-SiLU-Linear), the
    pair DCAE builds when temb_channels is set (DCAE.py:845-851)."""

    dim: int

    @nn.compact
    def __call__(self, t):
        e = timestep_embedding(t, 256)
        e = nn.Dense(self.dim, name="linear_1")(e)
        return nn.Dense(self.dim, name="linear_2")(nn.silu(e))


class AutoencoderDC(nn.Module):
    """Top-level AE. Native layout: (B, H, W, C).

    ``encode`` concatenates the static conditioning channels
    (DCAE.py:988-989); ``decode`` strips them unless ``return_static``
    (DCAE.py:1050-1052).
    """

    cfg: DCAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        if self.cfg.temb_channels:
            self.timestep_embedder = TimestepEmbedder(
                self.cfg.temb_channels, name="timestep_embedder")

    def _temb(self, time_elapsed):
        """(B,) raw timesteps -> (B, temb_channels) embedding
        (DCAE.py:983-985: Timesteps(256) then TimestepEmbedding)."""
        if time_elapsed is None:
            return None
        assert self.cfg.temb_channels, \
            "time_elapsed given but cfg.temb_channels is unset"
        return self.timestep_embedder(time_elapsed)

    def encode(self, x, static_conditioning=None, time_elapsed=None,
               temb=None):
        if static_conditioning is not None:
            if static_conditioning.ndim == 3:
                static_conditioning = jnp.broadcast_to(
                    static_conditioning[None],
                    (x.shape[0], *static_conditioning.shape))
            x = jnp.concatenate(
                [x, static_conditioning.astype(x.dtype)], axis=-1)
        if temb is None:
            temb = self._temb(time_elapsed)
        return self.encoder(x, temb)

    def decode(self, z, return_static: bool = False, time_elapsed=None,
               temb=None):
        if temb is None:
            temb = self._temb(time_elapsed)
        y = self.decoder(z, temb)
        if not return_static and self.cfg.static_channels:
            y = y[..., : -self.cfg.static_channels]
        return y

    def __call__(self, x, static_conditioning=None,
                 return_static: bool = False, time_elapsed=None):
        # Embed once and pass the embedding to both halves, as the
        # reference's full forward does (DCAE.py:1067-1068 computes temb
        # once and calls encode/decode with embedded_t=True).
        temb = self._temb(time_elapsed)
        z = self.encode(x, static_conditioning, temb=temb)
        return self.decode(z, return_static=return_static, temb=temb)
