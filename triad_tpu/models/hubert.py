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
import numpy as np
from flax import linen as nn

from triad_tpu.core.config import HubertConfig
from triad_tpu.models.layers import (
    DenseParams,
    NormParams,
    dot_product_attention,
    fused_dot_product_attention,
    fused_packed_dot_product_attention,
    merged_packed_dot_product_attention,
)

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


class _ConvAsBlockMatmul(nn.Module):
    """nn.Conv-compatible params, evaluated as ceil(k/s) contiguous-slice
    MXU matmuls — the fast VALID-conv lowering on TPU.

    Every window starts on a stride boundary, so reshaping the input to
    stride-sized blocks (B, nb, s*cin) makes window t = blocks
    [t, t + ceil(k/s)): y[t] = sum_i xb[t + i] @ V_i, where V_i holds
    kernel taps [i*s, min(k, (i+1)*s)) at their in-block positions and
    zeros elsewhere. Each matmul has contraction s*cin and contiguous
    operands — no strided slices (the im2col variant's weakness) and no
    (B, T, k*cin) blowup. XLA's own conv lowering measured 59 ms for
    conv_0 (21 GFLOP, in_channels=1) and 91 ms for conv_1 at B=64/10 s;
    this form is MXU-bound. FLOP overhead from the zero rows is
    ceil(k/s)*s/k (1.0 for k=10/s=5; 4/3 for k=3/s=2; 1.0 for k=2/s=2).
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, cin = x.shape
        k, s = self.kernel_size, self.stride
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, cin, self.features),
            self.param_dtype,
        )
        m = -(-k // s)  # ceil(k/s) block-matmuls
        t_out = (t - k) // s + 1
        nb = t_out + m - 1
        if nb * s > t:
            x = jnp.pad(x, ((0, 0), (0, nb * s - t), (0, 0)))
        xb = x[:, : nb * s].reshape(b, nb, s * cin)
        kf = kernel.astype(self.dtype)
        y = None
        for i in range(m):
            taps = kf[i * s : min(k, (i + 1) * s)]  # (<=s, cin, cout)
            if taps.shape[0] < s:
                taps = jnp.pad(taps, ((0, s - taps.shape[0]), (0, 0), (0, 0)))
            v = taps.reshape(s * cin, self.features)
            part = jnp.dot(xb[:, i : i + t_out], v)
            y = part if y is None else y + part
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class _ChannelNorm(nn.Module):
    """Per-channel affine normalization with externally supplied
    statistics. Param layout identical to nn.GroupNorm (scale, bias), so
    ports/checkpoints are unaffected. With num_groups == channels,
    GroupNorm IS per-(batch, channel)-over-time normalization — exactly
    what this applies given full-sequence stats. setup-based so the
    pallas frontend can read the affine params without applying."""

    dim: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.dim,), self.param_dtype
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.dim,), self.param_dtype
        )

    def affine(self):
        return self.scale, self.bias

    def __call__(self, x: jax.Array, mean: jax.Array, var: jax.Array) -> jax.Array:
        xn = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = xn * self.scale.astype(jnp.float32) + self.bias.astype(jnp.float32)
        return out.astype(self.dtype)


class _ConvParams(nn.Module):
    """Owns nn.Conv-identical params ({kernel}, conv_bias=False) without
    running the conv — the pallas fused frontend consumes them directly.
    Param tree paths match nn.Conv exactly."""

    features: int
    kernel_size: int
    in_features: int
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features),
            self.param_dtype,
        )


class ConvFeatureEncoder(nn.Module):
    """(B, T) waveform -> (B, T', conv_dim[-1]) frame features.

    ``cfg.frontend_impl``: "conv" uses XLA's conv lowering; "matmul"
    evaluates each layer as im2col (strided slices) + a single MXU
    matmul — same parameters and numerics.

    setup-based so ``conv0`` / ``norm`` / ``tail`` share parameters with
    ``__call__``: the chunked-remat path (HubertModel._chunked_frontend)
    splits the stack around the group norm — conv_0 is local in the
    waveform and conv_1..n are local in conv_0's output; only the
    group-norm statistics couple time steps, so they are computed in a
    separate cheap streaming pass.
    """

    cfg: HubertConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        convs = []
        for i, (dim, k, s) in enumerate(zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            if c.frontend_impl == "block_matmul":
                convs.append(
                    _ConvAsBlockMatmul(
                        dim, k, s, use_bias=c.conv_bias, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"conv_{i}",
                    )
                )
            elif c.frontend_impl == "matmul":
                convs.append(
                    _ConvAsMatmul(
                        dim, k, s, use_bias=c.conv_bias, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"conv_{i}",
                    )
                )
            elif c.frontend_impl in ("monolithic", "phase"):
                if c.conv_bias:
                    raise ValueError(
                        f"{c.frontend_impl} frontend: no conv bias"
                    )
                convs.append(
                    _ConvParams(
                        dim, k, in_features=1 if i == 0 else c.conv_dim[i - 1],
                        param_dtype=self.param_dtype, name=f"conv_{i}",
                    )
                )
            elif c.frontend_impl == "pallas" and i > 0:
                if s != 2 or k not in (2, 3) or c.conv_bias:
                    raise ValueError(
                        "pallas frontend requires stride-2, k in {2,3}, "
                        f"no bias after conv_0 (got k={k}, s={s})"
                    )
                convs.append(
                    _ConvParams(
                        dim, k, in_features=c.conv_dim[i - 1],
                        param_dtype=self.param_dtype, name=f"conv_{i}",
                    )
                )
            else:
                convs.append(
                    nn.Conv(
                        dim, kernel_size=(k,), strides=(s,), padding="VALID",
                        use_bias=c.conv_bias, dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"conv_{i}",
                    )
                )
        self.convs = convs
        self.group_norm = _ChannelNorm(
            c.conv_dim[0], epsilon=1e-5, dtype=self.dtype,
            param_dtype=self.param_dtype, name="group_norm",
        )

    # -- pieces (used by both the monolithic and chunked paths) ---------

    def conv0(self, audio: jax.Array) -> jax.Array:
        """First conv, pre-norm: (B, T) -> (B, T0, dim0)."""
        return self.convs[0](audio[:, :, None].astype(self.dtype))

    @staticmethod
    def stats(y0: jax.Array):
        """Full-sequence per-(batch, channel) mean/var of conv_0 output
        (the group-norm statistics): (B, 1, C) each, fp32, biased var."""
        y = y0.astype(jnp.float32)
        mean = jnp.mean(y, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(y), axis=1, keepdims=True) - jnp.square(mean)
        return mean, var

    def tail(self, y0: jax.Array, mean: jax.Array, var: jax.Array) -> jax.Array:
        """norm(with given stats) -> gelu -> conv_1..n (+gelu each)."""
        if self.cfg.frontend_impl == "conv_act":
            return self._conv_act_tail(y0, mean, var)
        x = nn.gelu(self.group_norm(y0, mean, var), approximate=False)
        for conv in self.convs[1:]:
            x = nn.gelu(conv(x), approximate=False)
        return x

    def _conv_act_tail(
        self, y0: jax.Array, mean: jax.Array, var: jax.Array
    ) -> jax.Array:
        """XLA convs + pallas activations: the convs stay in XLA's
        near-roofline bare form (fusing the GELU into them measured +60%
        on the conv) while norm/GELU run as one tiled VMEM pass each
        (ops/pallas_conv.pallas_activation)."""
        from triad_tpu.ops.pallas_conv import identity_stats, pallas_activation

        scale, bias = self.group_norm.affine()
        rstd = jax.lax.rsqrt(var + self.group_norm.epsilon)
        x = pallas_activation(
            y0.astype(self.dtype), mean, rstd,
            scale.astype(jnp.float32), bias.astype(jnp.float32), "norm_gelu",
        )
        b = x.shape[0]
        for conv in self.convs[1:]:
            x = conv(x)
            x = pallas_activation(x, *identity_stats(b, x.shape[-1]), "gelu")
        return x

    def _pallas_tail(
        self, y0: jax.Array, mean: jax.Array, var: jax.Array, t_log: int
    ) -> jax.Array:
        """Same composition with each inter-layer activation fused into
        the next conv's VMEM input read (ops/pallas_conv.py): the
        normalized/activated tensors never reach HBM. ``t_log`` is the
        logical row count of y0 (rows past it are alignment garbage,
        see pallas_conv's scheme). The final conv's GELU stays in XLA
        (tiny at (B, T', 512))."""
        from triad_tpu.ops.pallas_conv import (
            fused_frontend_conv,
            identity_stats,
            out_rows,
        )

        scale, bias = self.group_norm.affine()
        rstd = jax.lax.rsqrt(var + self.group_norm.epsilon)
        x = y0.astype(self.dtype)
        b = x.shape[0]
        prologue = "norm_gelu"
        m, r, sc, bi = mean, rstd, scale, bias
        for conv in self.convs[1:]:
            x = fused_frontend_conv(
                x, conv.kernel, m, r, sc, bi, t_log, prologue
            )
            t_log = out_rows(t_log, conv.kernel_size)
            if prologue == "norm_gelu":
                # later prologues are plain GELU; stats args are unused
                # but must match the layer's input width.
                prologue = "gelu"
            cin = conv.features
            if m.shape[-1] != cin:
                m, r, sc, bi = identity_stats(b, cin)
        return nn.gelu(x[:, :t_log], approximate=False)

    def _phase_frontend(self, audio: jax.Array) -> jax.Array:
        """Pure-XLA phase-split matmul frontend.

        Every stride-2 conv consumes its input as two phase arrays
        (even/odd time steps) — free lane-slices of a free reshape — so
        each layer is 2-3 plain MXU matmuls (contraction 512) plus
        elementwise GELU, with no XLA conv lowering, no im2col widening
        (the round-1 'matmul' impl materialized (T, K*C) windows and
        lost), and no stride-2 gathers: a layer's (B, m, C) output
        reshapes to (B, m/2, 2C) phase-split form for free. conv_0
        (k=10, s=5) becomes two (B, T/10, 10) @ (10, C) matmuls (even /
        5-shifted odd windows) whose outputs ARE conv_1's phase inputs
        — never interleaved. GroupNorm stats come from both phase
        arrays jointly. Eval fast path (profile: XLA's conv lowering
        held 47 ms of the 140 ms step at B=64); training keeps the
        chunked-remat conv path for backward memory."""
        c = self.cfg
        C = c.conv_dim[0]
        B, T = audio.shape
        T -= T % 10
        audio = audio[:, :T].astype(self.dtype)
        m0 = (T - 10) // 5 + 1  # conv_0 logical outputs

        w0 = self.convs[0].kernel.reshape(10, C).astype(self.dtype)
        x10a = audio.reshape(B, T // 10, 10)
        x10b = audio[:, 5 : T - 5].reshape(B, T // 10 - 1, 10)
        ye = jnp.einsum("btk,kc->btc", x10a, w0)  # even outputs
        yo = jnp.einsum("btk,kc->btc", x10b, w0)  # odd outputs
        ne, no = (m0 + 1) // 2, m0 // 2  # valid rows: 16000 / 15999
        ye = ye[:, :ne]
        yo = yo[:, :no]

        # GroupNorm (per-channel over all m0 time steps) + affine + GELU
        se = jnp.sum(ye.astype(jnp.float32), axis=1)
        so = jnp.sum(yo.astype(jnp.float32), axis=1)
        sqe = jnp.sum(jnp.square(ye.astype(jnp.float32)), axis=1)
        sqo = jnp.sum(jnp.square(yo.astype(jnp.float32)), axis=1)
        mean = (se + so) / m0  # (B, C)
        var = (sqe + sqo) / m0 - jnp.square(mean)
        g_scale, g_bias = self.group_norm.affine()
        scale = (
            g_scale.astype(jnp.float32)
            * jax.lax.rsqrt(var + self.group_norm.epsilon)
        )
        bias = g_bias.astype(jnp.float32) - mean * scale
        act = lambda x, s, b: nn.gelu(
            (x.astype(jnp.float32) * s[:, None] + b[:, None]).astype(
                self.dtype
            ),
            approximate=False,
        )
        x_e = act(ye, scale, bias)
        x_o = act(yo, scale, bias)

        t_log = m0
        y = None
        for conv in self.convs[1:]:
            k = conv.kernel_size
            w = conv.kernel.astype(self.dtype)  # (k, C, C)
            m = (t_log - k) // 2 + 1
            y = jnp.einsum("btc,cd->btd", x_e[:, :m], w[0])
            y = y + jnp.einsum("btc,cd->btd", x_o[:, :m], w[1])
            if k == 3:
                y = y + jnp.einsum(
                    "btc,cd->btd", x_e[:, 1 : m + 1], w[2]
                )
            if conv is not self.convs[-1]:
                yg = nn.gelu(y, approximate=False)
                # free phase split: pad 2 rows, reshape (B, m', 2C)
                yp = jnp.pad(yg, ((0, 0), (0, 2), (0, 0)))
                rows = (m + 2) // 2
                x2 = yp[:, : 2 * rows].reshape(B, rows, 2 * C)
                x_e = x2[..., :C]
                x_o = x2[..., C:]
            t_log = m
        return nn.gelu(y[:, :t_log], approximate=False)

    def __call__(self, audio: jax.Array) -> jax.Array:
        if self.cfg.frontend_impl == "phase":
            return self._phase_frontend(audio)
        if self.cfg.frontend_impl == "monolithic":
            from triad_tpu.ops import pallas_frontend as mf

            c = self.cfg
            if (
                tuple(c.conv_kernel) != mf.KERNELS
                or tuple(c.conv_stride) != mf.STRIDES
                or any(d != mf.C for d in c.conv_dim)
            ):
                raise ValueError(
                    "monolithic frontend supports the HuBERT-base "
                    "geometry only (kernels 10,3x4,2x2 / strides "
                    "5,2x6 / 512 channels)"
                )
            scale, bias = self.group_norm.affine()
            return mf.monolithic_frontend_vjp(
                audio,
                self.convs[0].kernel,
                scale.astype(jnp.float32),
                bias.astype(jnp.float32),
                [conv.kernel for conv in self.convs[1:]],
                c.frontend_tb,
                self.dtype,
                c.frontend_gelu,
                c.frontend_wave_layout,
            )
        if self.cfg.frontend_impl == "pallas":
            from triad_tpu.ops.pallas_conv import min_input_alloc

            c = self.cfg
            k0, s0 = c.conv_kernel[0], c.conv_stride[0]
            t0 = (audio.shape[1] - k0) // s0 + 1
            need = min_input_alloc(t0, c.conv_kernel[1])
            if t0 < need:
                # zero-pad the waveform so conv_0 emits the margin rows
                # the aligned pallas reads may touch (garbage region).
                audio = jnp.pad(audio, ((0, 0), (0, (need - t0) * s0)))
            y0 = self.conv0(audio)
            mean, var = self.stats(y0[:, :t0])
            return self._pallas_tail(y0, mean, var, t0)
        y0 = self.conv0(audio)
        mean, var = self.stats(y0)
        return self.tail(y0, mean, var)


class _PosConvParams(nn.Module):
    """nn.Conv-identical params ({kernel, bias}) without running the
    conv — the pallas fused pos-conv consumes them directly. Param tree
    paths and initializers match nn.Conv exactly."""

    features: int
    kernel_size: int
    in_per_group: int
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_per_group, self.features),
            self.param_dtype,
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            self.param_dtype,
        )


class PositionalConvEmbedding(nn.Module):
    cfg: HubertConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        k = c.num_conv_pos_embeddings
        g = c.num_conv_pos_embedding_groups
        if c.posconv_impl == "pallas":
            # Fused packed-layout kernel (ops/pallas_posconv.py): no
            # XLA grouped-conv relayouts, window-stacked MXU matmuls,
            # custom VJP (dW accumulated in VMEM over the batch grid).
            from triad_tpu.ops.pallas_posconv import pos_conv_gelu

            p = _PosConvParams(
                c.hidden_size, k, c.hidden_size // g,
                param_dtype=self.param_dtype, name="conv",
            )
            return pos_conv_gelu(
                x.astype(self.dtype), p.kernel.astype(self.dtype),
                p.bias, g, "erf",
            ).astype(self.dtype)
        if c.posconv_impl != "conv":
            # A typo must not silently fall through to the XLA branch —
            # it would mislabel hardware A/B measurements.
            raise ValueError(f"unknown posconv_impl {c.posconv_impl!r}")
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
        # Default paths keep q/k/v as three separate nn.Dense matmuls:
        # merging into one (h, 3h) matmul measured 419 vs 448 clips/s
        # at eval in round 1 — the (B, T, 3h) output's split slices for
        # XLA attention cost more in layout copies than the bigger
        # matmul saved. The "packed_merged"/"fused_packed_merged" impls
        # below retry the merge WITHOUT the split: the merged tensor
        # feeds a pallas kernel that reads q/k/v at lane offsets.
        dense = lambda name: nn.Dense(
            c.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        impl = c.attention_impl
        rate = 0.0 if deterministic else c.attention_dropout
        if impl in (
            "packed_merged", "fused_packed_merged", "packed_merged_pair"
        ):
            from triad_tpu.models.quantize import int8_active

            if int8_active():
                # The merged qkv matmul below is a raw DenseParams
                # contraction — nn.intercept_methods cannot quantize it,
                # so the int8 serving mode would silently run its
                # largest per-layer matmuls in bf16. Raise instead.
                raise ValueError(
                    "hubert attention_impl=packed_merged bypasses the "
                    "int8 Dense interception (raw qkv matmul); use the "
                    "xla impls for int8 serving (models/quantize.py)"
                )
            # One (C, 3C) qkv matmul feeding the merged-layout pallas
            # kernels (the activation is read from HBM once instead of
            # three times, ~1.2 GB/step at B=64). Param tree stays
            # q_proj/k_proj/v_proj {kernel, bias} — checkpoint- and
            # A/B-interchangeable with the unmerged paths. The round-1
            # merge lost (419 vs 448 clips/s) because its output had to
            # be SPLIT for XLA attention; here q/k/v are lane offsets
            # inside the kernel and no split ever materializes.
            params = [
                DenseParams(
                    c.hidden_size, param_dtype=self.param_dtype, name=nm
                )(c.hidden_size)
                for nm in ("q_proj", "k_proj", "v_proj")
            ]
            w = jnp.concatenate([p[0] for p in params], axis=1)
            bvec = jnp.concatenate([p[1] for p in params])
            qkv = x.astype(self.dtype) @ w.astype(self.dtype) + bvec.astype(
                self.dtype
            )
            rng = self.make_rng("dropout") if rate > 0 else None
            out = merged_packed_dot_product_attention(
                qkv, None, self.dtype, head_dim,
                dropout_rate=rate, dropout_rng=rng,
                # Training with attention_dropout=0 still needs d(qkv);
                # the eval kernel has no VJP.
                differentiable=not deterministic,
                # "packed_merged_pair": head-pair block-diagonal eval
                # inner loop (128-deep matmuls, MXU softmax denoms).
                pair=impl == "packed_merged_pair",
                pad=c.attention_pad,
            )
            return dense("out_proj")(out)
        q = dense("q_proj")(x).reshape(*x.shape[:2], c.num_heads, head_dim)
        k = dense("k_proj")(x).reshape(*x.shape[:2], c.num_heads, head_dim)
        v = dense("v_proj")(x).reshape(*x.shape[:2], c.num_heads, head_dim)
        if impl == "auto":
            # fused wins exactly where the XLA path pays for HBM
            # dropout-mask traffic: training with attention dropout on a
            # TPU backend (measured 6.2 vs 14.0 ms/layer fwd+bwd at
            # B=64; at p=0 XLA is faster). CPU (tests) stays on XLA.
            on_tpu = jax.default_backend() in ("tpu", "axon")
            impl = "fused" if (rate > 0.0 and on_tpu) else "xla"
        elif impl in ("packed", "packed_pair") and rate > 0.0:
            # "packed" is the dropout-free eval kernel; with live
            # attention dropout fall back to the auto rule (fused
            # dropout kernel on TPU, XLA elsewhere).
            on_tpu = jax.default_backend() in ("tpu", "axon")
            impl = "fused" if on_tpu else "xla"
        if impl in ("fused", "fused_packed"):
            rng = self.make_rng("dropout") if rate > 0 else None
            fn = (
                fused_packed_dot_product_attention
                if impl == "fused_packed"
                else fused_dot_product_attention
            )
            kw = (
                {"pad": c.attention_pad} if impl == "fused_packed" else {}
            )
            out = fn(
                q, k, v, None, self.dtype,
                dropout_rate=rate, dropout_rng=rng, **kw,
            )
        else:
            probs_dropout = None
            # Only a LIVE dropout blocks the dropout-free fused paths
            # ("flash"/"packed"): at eval the deterministic nn.Dropout
            # is an identity, so don't let it mask the fast routes.
            if c.attention_dropout > 0 and not deterministic:
                drop = nn.Dropout(c.attention_dropout, name="attn_dropout")
                probs_dropout = lambda p: drop(p, deterministic=False)
            out = dot_product_attention(
                q, k, v, None, self.dtype,
                scores_dtype=jnp.dtype(c.attention_scores_dtype),
                probs_dropout=probs_dropout,
                impl=impl,
                eval_pad=c.attention_pad,
            )
        return dense("out_proj")(out.reshape(*x.shape[:2], c.hidden_size))


class HubertEncoderLayer(nn.Module):
    """Post-LN block (HF HubertEncoderLayer, base config)."""

    cfg: HubertConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _residual_ln(
        self, name: str, x: jax.Array, h: jax.Array, deterministic: bool
    ) -> jax.Array:
        """LN(x + dropout(h, hidden_dropout)) — fused pallas kernel or
        the XLA Dropout/add/LayerNorm pipeline (same param tree)."""
        c = self.cfg
        rate = 0.0 if deterministic else c.hidden_dropout
        impl = c.ln_impl
        if impl == "auto":
            # the win is the removed (B, T, C) HBM mask traffic — only
            # there when dropout is active on a TPU backend.
            on_tpu = jax.default_backend() in ("tpu", "axon")
            impl = "fused" if (rate > 0.0 and on_tpu) else "xla"
        drop_name = (
            "attn_out_dropout" if name == "layer_norm" else "output_dropout"
        )
        if impl == "fused":
            from triad_tpu.ops.pallas_ln import fused_dropout_add_ln

            scale, bias = NormParams(
                c.hidden_size, param_dtype=self.param_dtype, name=name
            )()
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
            else:
                seed = jnp.zeros((), jnp.int32)
            return fused_dropout_add_ln(
                x.astype(self.dtype), h.astype(self.dtype), scale, bias,
                seed, float(rate), float(c.layer_norm_eps),
                c.ln_block_rows,
            )
        h = nn.Dropout(c.hidden_dropout, name=drop_name)(
            h, deterministic=deterministic
        )
        return nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )(x + h)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.cfg
        attn = HubertSelfAttention(
            c, dtype=self.dtype, param_dtype=self.param_dtype, name="attention"
        )(x, deterministic=deterministic)
        x = self._residual_ln("layer_norm", x, attn, deterministic)
        mlp_impl = c.mlp_impl
        act_rate = 0.0 if deterministic else c.activation_dropout
        if mlp_impl == "auto":
            # Fused wins on TPU both with dropout (the (B, T, 3072)
            # HBM mask pipeline disappears; 7.7 vs 10.5 ms/layer
            # fwd+bwd) and at p=0 eval (XLA's unfused erf-gelu pipeline
            # costs ~1 ms/layer extra; re-measured in the round-1 eval
            # sweep: 114.9 vs 127.8 ms audio fwd at B=64).
            on_tpu = jax.default_backend() in ("tpu", "axon")
            mlp_impl = "fused" if on_tpu else "xla"
        if mlp_impl == "fused":
            from triad_tpu.ops.pallas_mlp import fused_mlp

            w1, b1 = DenseParams(
                c.intermediate_size, param_dtype=self.param_dtype,
                name="intermediate_dense",
            )(c.hidden_size)
            w2, b2 = DenseParams(
                c.hidden_size, param_dtype=self.param_dtype,
                name="output_dense",
            )(c.intermediate_size)
            if act_rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
            else:
                seed = jnp.zeros((), jnp.int32)
            h = fused_mlp(
                x.astype(self.dtype),
                w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
                seed, float(act_rate), c.mlp_gelu, c.mlp_block_rows,
            )
        else:
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
        return self._residual_ln("final_layer_norm", x, h, deterministic)


def _spec_augment_time_mask(
    x: jax.Array,
    masked_embed: jax.Array,
    rng: jax.Array,
    mask_prob: float,
    mask_length: int,
    min_masks: int,
) -> jax.Array:
    """HF ``_compute_mask_indices`` time masking, shape-static.

    Per batch row: the span count is ``max(min_masks,
    floor(mask_prob*T/L + U[0,1)))`` (HF's stochastic rounding), span
    starts are uniform over [0, T-L]; spans may overlap (as in HF).
    Masked positions are replaced by the learned ``masked_spec_embed``
    vector. Statically we always draw ``max_spans`` candidate spans and
    activate the first ``num_spans`` of them.
    """
    B, T, _ = x.shape
    L = min(mask_length, T)
    mean_spans = mask_prob * T / L
    max_spans = max(min_masks, int(np.ceil(mean_spans)) + 1)
    r_eps, r_start = jax.random.split(rng)
    eps = jax.random.uniform(r_eps, (B,))
    num_spans = jnp.maximum(
        min_masks, jnp.floor(mean_spans + eps).astype(jnp.int32)
    )
    starts = jax.random.randint(
        r_start, (B, max_spans), 0, max(1, T - L + 1)
    )
    active = jnp.arange(max_spans)[None, :] < num_spans[:, None]  # (B, S)
    pos = jnp.arange(T)[None, None, :]  # (1, 1, T)
    in_span = (pos >= starts[..., None]) & (pos < starts[..., None] + L)
    time_mask = jnp.any(in_span & active[..., None], axis=1)  # (B, T)
    return jnp.where(time_mask[..., None], masked_embed, x)


class HubertModel(nn.Module):
    """(B, T) normalized waveform -> (B, T', hidden) last hidden state.

    The caller is responsible for ``normalize_waveform`` (matching the
    reference's processor-inside-forward quirk, model.py:56-64).
    """

    cfg: HubertConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _chunked_frontend(self, frontend, audio: jax.Array) -> jax.Array:
        """Two-pass chunked evaluation of the conv frontend, each chunk
        under jax.checkpoint.

        The only temporal coupling in the stack is the group norm's
        full-sequence statistics, so:
          pass A streams conv_0 over waveform chunks accumulating the
          per-(batch, channel) sum / sum-of-squares (fp32 scalars per
          channel — negligible memory);
          pass B recomputes conv_0 per token block, applies the norm
          with the global stats, and runs conv_1..n (both halves are
          VALID convs => temporally local, so blocks are exact).
        Live activations drop from O(T) to O(T / n_chunks) in forward
        AND backward; numerics match the monolithic path (tested).
        """
        c = self.cfg
        k0, s0 = c.conv_kernel[0], c.conv_stride[0]
        T = audio.shape[1]
        t0_len = (T - k0) // s0 + 1  # conv_0 output length
        stride_tail = 1
        for s in c.conv_stride[1:]:
            stride_tail *= s
        receptive_tail = 1
        for k, s in zip(reversed(c.conv_kernel[1:]), reversed(c.conv_stride[1:])):
            receptive_tail = (receptive_tail - 1) * s + k
        total_tokens = c.num_audio_tokens(T)

        conv0_fn = nn.checkpoint(lambda mdl, a: mdl.conv0(a))
        tail_fn = nn.checkpoint(
            lambda mdl, a, m, v: mdl.tail(mdl.conv0(a), m, v)
        )

        # Pass A: streaming group-norm statistics.
        chunk0 = min(c.frontend_chunk_tokens * stride_tail, t0_len)
        total = jnp.zeros((audio.shape[0], 1, c.conv_dim[0]), jnp.float32)
        total_sq = jnp.zeros_like(total)
        u0 = 0
        while u0 < t0_len:
            u1 = min(t0_len, u0 + chunk0)
            y0 = conv0_fn(
                frontend, audio[:, u0 * s0 : (u1 - 1) * s0 + k0]
            ).astype(jnp.float32)
            total = total + jnp.sum(y0, axis=1, keepdims=True)
            total_sq = total_sq + jnp.sum(jnp.square(y0), axis=1, keepdims=True)
            u0 = u1
        mean = total / t0_len
        var = total_sq / t0_len - jnp.square(mean)

        # Pass B: normalized frontend per token block.
        chunk_t = min(c.frontend_chunk_tokens, total_tokens)
        outs = []
        t0 = 0
        while t0 < total_tokens:
            t1 = min(total_tokens, t0 + chunk_t)
            v0 = t0 * stride_tail
            v1 = (t1 - 1) * stride_tail + receptive_tail
            a0, a1 = v0 * s0, (v1 - 1) * s0 + k0
            outs.append(tail_fn(frontend, audio[:, a0:a1], mean, var))
            t0 = t1
        return jnp.concatenate(outs, axis=1)

    @nn.compact
    def __call__(self, audio: jax.Array, deterministic: bool = True) -> jax.Array:
        c = self.cfg
        # The conv-frontend activations are the HBM hot spot of the
        # backward (bf16[B, T/5, 512] ~2 GB per layer at B=64/10 s).
        # remat="conv" checkpoints the whole frontend; the default
        # "chunked_conv" additionally exploits temporal locality: a VALID
        # conv chain maps output token t to input window
        # [t*stride_total, t*stride_total + receptive_field), so token
        # blocks are computed independently, each rematted — live memory
        # drops by the chunk factor in BOTH fwd and bwd, numerics
        # unchanged (tested vs the monolithic conv).
        frontend_cls = ConvFeatureEncoder
        if c.remat in ("conv", "full"):
            frontend_cls = nn.remat(ConvFeatureEncoder)
        frontend = frontend_cls(
            c, dtype=self.dtype, param_dtype=self.param_dtype,
            name="feature_extractor",
        )
        if c.remat == "chunked_conv" and c.frontend_impl not in (
            "pallas", "monolithic", "phase"
        ):
            # Kept for eval too: although the two-pass form exists for
            # backward-pass memory (conv_0 runs twice), it measured ~8 ms
            # FASTER than the monolithic frontend even at eval B=64 (XLA
            # pipelines the small chunks better than one O(T) program).
            # The pallas frontend is monolithic by design (its own
            # block loop lives in VMEM) — chunking would defeat it.
            x = self._chunked_frontend(frontend, audio)
        else:
            x = frontend(audio)
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
        # SpecAugment time masking (HF modeling_hubert applies it right
        # after feature projection, before the encoder; active in the
        # reference's train forwards). The param is declared iff
        # mask_time_prob > 0 — HF's creation rule — so ported HF trees
        # match ours key-for-key.
        if c.mask_time_prob > 0:
            masked_embed = self.param(
                "masked_spec_embed",
                nn.initializers.uniform(scale=1.0),
                (c.hidden_size,),
                self.param_dtype,
            )
            if not deterministic and c.apply_spec_augment:
                x = _spec_augment_time_mask(
                    x, masked_embed.astype(x.dtype), self.make_rng("dropout"),
                    c.mask_time_prob, c.mask_time_length,
                    c.mask_time_min_masks,
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
