"""Flax HuBERT-base encoder (reference audio backbone, model.py:27-30:
``facebook/hubert-base-ls960``).

From-scratch Flax implementation matching the HF ``HubertModel`` base
computation graph (do_stable_layer_norm=False, feat_extract_norm="group",
conv_bias=False):

  7-layer conv waveform frontend (group norm on layer 0 only, GELU)
  feature projection: LayerNorm -> Dense(512 -> 768)
  conv positional embedding (kernel 128, 16 groups, weight-normed in
  torch — ported as a plain kernel) with same-pad trim + GELU
  x = x + pos; LayerNorm; 12 post-LN transformer blocks

The HF processor's per-row zero-mean/unit-var normalization over the
*padded* waveform (reference model.py:56-62 quirk — stats include the
zero padding) lives in ``normalize_waveform`` and is applied by the
caller before the conv stack.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from triad_tpu.core.config import HubertConfig
from triad_tpu.models.layers import dot_product_attention

Dtype = Any


def normalize_waveform(audio: jax.Array) -> jax.Array:
    """Wav2Vec2FeatureExtractor zero-mean/unit-var normalization, applied
    per padded batch row (reference model.py:56-62): stats over the full
    row including zero padding, eps 1e-7 inside the sqrt."""
    audio = audio.astype(jnp.float32)
    mean = jnp.mean(audio, axis=-1, keepdims=True)
    var = jnp.var(audio, axis=-1, keepdims=True)
    return (audio - mean) / jnp.sqrt(var + 1e-7)


def _im2col_1d(x: jax.Array, kernel: int, stride: int) -> jax.Array:
    """(B, T, C) -> (B, T_out, kernel*C) windows, VALID padding.

    Built from strided slices (no gather): window position t covers rows
    [t*stride, t*stride + kernel). Turns a conv into one MXU matmul.
    """
    B, T, C = x.shape
    t_out = (T - kernel) // stride + 1
    cols = []
    for off in range(kernel):
        end = off + (t_out - 1) * stride + 1
        cols.append(x[:, off:end:stride, :])
    return jnp.concatenate(cols, axis=-1)


class _ConvAsMatmul(nn.Module):
    """Owns nn.Conv-compatible params (kernel (k, in, out) [+ bias]) but
    evaluates as im2col + one MXU matmul. Same param path as nn.Conv, so
    checkpoints/ports are layout-identical."""

    features: int
    kernel_size: int
    stride: int
    use_bias: bool
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_features, self.features),
            self.param_dtype,
        )
        cols = _im2col_1d(x, self.kernel_size, self.stride)
        # im2col layout is [off0 | off1 | ...] blocks of channels, which
        # matches kernel.reshape(k*in, out) row order.
        y = jnp.dot(cols, kernel.reshape(-1, self.features).astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class ConvFeatureEncoder(nn.Module):
    """(B, T) waveform -> (B, T', conv_dim[-1]) frame features.

    ``cfg.frontend_impl``: "conv" uses XLA's conv lowering; "matmul"
    evaluates each layer as im2col (strided slices) + a single MXU
    matmul — same parameters and numerics, often faster on TPU for the
    stride-5 single-channel first layer.
    """

    cfg: HubertConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio: jax.Array) -> jax.Array:
        c = self.cfg
        x = audio[:, :, None].astype(self.dtype)
        for i, (dim, k, s) in enumerate(zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            if c.frontend_impl == "matmul":
                x = _ConvAsMatmul(
                    dim, k, s, use_bias=c.conv_bias, dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"conv_{i}",
                )(x)
            else:
                x = nn.Conv(
                    dim,
                    kernel_size=(k,),
                    strides=(s,),
                    padding="VALID",
                    use_bias=c.conv_bias,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"conv_{i}",
                )(x)
            if i == 0:
                # Group norm with one group per channel == per-channel
                # instance norm over time (HF GroupNormConvLayer).
                x = nn.GroupNorm(
                    num_groups=dim,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="group_norm",
                )(x)
            x = nn.gelu(x, approximate=False)
        return x


class PositionalConvEmbedding(nn.Module):
    cfg: HubertConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        k = c.num_conv_pos_embeddings
        pad = k // 2
        h = nn.Conv(
            c.hidden_size,
            kernel_size=(k,),
            strides=(1,),
            padding=[(pad, pad)],
            feature_group_count=c.num_conv_pos_embedding_groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        if k % 2 == 0:
            # HubertSamePadLayer: trim the trailing element for even kernels.
            h = h[:, :-1]
        return nn.gelu(h, approximate=False)


class HubertSelfAttention(nn.Module):
    cfg: HubertConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        dense = lambda name: nn.Dense(
            c.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q = dense("q_proj")(x).reshape(*x.shape[:2], c.num_heads, head_dim)
        k = dense("k_proj")(x).reshape(*x.shape[:2], c.num_heads, head_dim)
        v = dense("v_proj")(x).reshape(*x.shape[:2], c.num_heads, head_dim)
        probs_dropout = None
        if c.attention_dropout > 0:
            drop = nn.Dropout(c.attention_dropout, name="attn_dropout")
            probs_dropout = lambda p: drop(p, deterministic=deterministic)
        out = dot_product_attention(
            q, k, v, None, self.dtype,
            scores_dtype=jnp.dtype(c.attention_scores_dtype),
            probs_dropout=probs_dropout,
        )
        return dense("out_proj")(out.reshape(*x.shape[:2], c.hidden_size))


class HubertEncoderLayer(nn.Module):
    """Post-LN block (HF HubertEncoderLayer, base config)."""

    cfg: HubertConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.cfg
        attn = HubertSelfAttention(
            c, dtype=self.dtype, param_dtype=self.param_dtype, name="attention"
        )(x, deterministic=deterministic)
        attn = nn.Dropout(c.hidden_dropout, name="attn_out_dropout")(
            attn, deterministic=deterministic
        )
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="layer_norm",
        )(x + attn)
        h = nn.Dense(
            c.intermediate_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="intermediate_dense",
        )(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(c.activation_dropout, name="intermediate_dropout")(
            h, deterministic=deterministic
        )
        h = nn.Dense(
            c.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="output_dense",
        )(h)
        h = nn.Dropout(c.hidden_dropout, name="output_dropout")(
            h, deterministic=deterministic
        )
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="final_layer_norm",
        )(x + h)
        return x


class HubertModel(nn.Module):
    """(B, T) normalized waveform -> (B, T', hidden) last hidden state.

    The caller is responsible for ``normalize_waveform`` (matching the
    reference's processor-inside-forward quirk, model.py:56-64).
    """

    cfg: HubertConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, audio: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.cfg
        # Remat (jax.checkpoint) the conv frontend: its activations are
        # the HBM hot spot of the backward (bf16[B, T/5, 512] ~2 GB per
        # layer at B=64/10 s); recompute is cheap relative to the
        # transformer. "full" also remats each encoder layer.
        frontend_cls = ConvFeatureEncoder
        if c.remat in ("conv", "full"):
            frontend_cls = nn.remat(ConvFeatureEncoder)
        x = frontend_cls(
            c, dtype=self.dtype, param_dtype=self.param_dtype,
            name="feature_extractor",
        )(audio)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="feature_projection_norm",
        )(x)
        x = nn.Dense(
            c.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype,
            name="feature_projection",
        )(x)
        x = nn.Dropout(c.feat_proj_dropout, name="feat_proj_dropout")(
            x, deterministic=deterministic
        )
        pos = PositionalConvEmbedding(
            c, dtype=self.dtype, param_dtype=self.param_dtype, name="pos_conv_embed"
        )(x)
        x = x + pos
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype,
            name="encoder_layer_norm",
        )(x)
        x = nn.Dropout(c.hidden_dropout, name="encoder_dropout")(
            x, deterministic=deterministic
        )
        layer_cls = HubertEncoderLayer
        if c.remat == "full":
            # static_argnums counts the bound method's args with self=0:
            # (self, x, deterministic) -> deterministic is arg 2.
            layer_cls = nn.remat(HubertEncoderLayer, static_argnums=(2,))
        for i in range(c.num_layers):
            layer = layer_cls(
                c, dtype=self.dtype, param_dtype=self.param_dtype, name=f"layer_{i}"
            )
            y = layer(x, deterministic)
            if not deterministic and c.layerdrop > 0:
                # HF LayerDrop: the whole layer is skipped with prob p
                # per call during training (one decision for the batch).
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - c.layerdrop
                )
                x = jnp.where(keep, y, x)
            else:
                x = y
        return x
