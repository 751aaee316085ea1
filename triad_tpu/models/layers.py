"""Shared Flax building blocks for the triad_tpu encoders.

Everything is written mask-first and fixed-shape (XLA requirement), with a
``dtype`` knob implementing the reference's bf16-autocast-for-encoders
policy (reference model.py:483-485, 603-605): parameters stay fp32
(``param_dtype``), activations/matmuls run in ``dtype``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _dropout_seed(dropout_rng: jax.Array) -> jax.Array:
    """int32 kernel seed from a JAX PRNG key — the ONE derivation every
    replayed-PRNG pallas kernel shares (a change here must apply to all
    of them at once or kernels documented to share seeds would silently
    desynchronize)."""
    return jax.random.randint(
        dropout_rng, (), minval=0, maxval=jnp.iinfo(jnp.int32).max,
        dtype=jnp.int32,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    dtype: Dtype,
) -> jax.Array:
    """Fused (pallas) attention: no (B, H, Nq, Nk) probs in HBM.

    q, k, v: (B, N, H, Dh) — same layout as dot_product_attention.
    mask: optional (B, 1, 1, Nk) boolean key mask (True = attend),
    converted to flash segment ids. N is padded to a 128 multiple with
    masked tokens, so outputs for real tokens are EXACTLY the masked
    softmax (numerics at bf16/fp32-accum, like scores_dtype=bfloat16).

    Block sizes: full-sequence blocks measured fastest at the model's
    shapes on v5e (HuBERT 499->512, ViT 261->384; block sweep in round-1
    notes); attention here is d_head=64-contraction-bound on the MXU, so
    the win over XLA is the removed probs traffic, ~1.3-1.9 ms/layer.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, n, h, d = q.shape
    n_pad = _round_up(n, 128)
    sm_scale = float(1.0 / np.sqrt(d))

    def to_bhnd(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
        return x.astype(dtype)

    qp, kp, vp = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    seg = None
    if n_pad != n or mask is not None:
        if mask is not None:
            kv_seg = mask.reshape(b, n).astype(jnp.int32)
        else:
            kv_seg = jnp.ones((b, n), jnp.int32)
        kv_seg = jnp.pad(kv_seg, ((0, 0), (0, n_pad - n)))
        # Queries are all "segment 1": they attend to unmasked keys only.
        q_seg = jnp.pad(
            jnp.ones((b, n), jnp.int32), ((0, 0), (0, n_pad - n))
        )
        seg = SegmentIds(q_seg, kv_seg)

    block = min(512, n_pad)
    bs = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block,
    )
    out = flash_attention(
        qp, kp, vp, segment_ids=seg, sm_scale=sm_scale, block_sizes=bs
    )
    return jnp.transpose(out[:, :, :n], (0, 2, 1, 3))


def fused_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    dtype: Dtype,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Adapter for ops.pallas_attention.fused_attention: (B, N, H, Dh)
    layout, pads N to a 128 multiple (padded keys masked; padded query
    rows sliced off), derives an int32 seed from the dropout rng.

    This is the training-path kernel: fp32 scores + softmax + Bernoulli
    keep + 1/(1-p) scaling stay semantically identical to the XLA path,
    but the (B, H, N, N) probs/mask tensors never reach HBM (the
    training profile's single largest cost at ~210 ms/step, B=64)."""
    from triad_tpu.ops.pallas_attention import fused_attention

    b, n, h, d = q.shape
    n_pad = _round_up(n, 128)
    sm_scale = float(1.0 / np.sqrt(d))

    def to_bhnd(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
        return x.astype(dtype)

    if mask is not None:
        key_mask = mask.reshape(b, n).astype(jnp.float32)
    else:
        key_mask = jnp.ones((b, n), jnp.float32)
    if n_pad != n:
        key_mask = jnp.pad(key_mask, ((0, 0), (0, n_pad - n)))

    if dropout_rate > 0.0 and dropout_rng is not None:
        seed = _dropout_seed(dropout_rng)
    else:
        seed = jnp.zeros((), jnp.int32)
        dropout_rate = 0.0

    out = fused_attention(
        to_bhnd(q), to_bhnd(k), to_bhnd(v), key_mask, seed,
        float(dropout_rate), sm_scale,
    )
    return jnp.transpose(out[:, :, :n], (0, 2, 1, 3))


def fused_packed_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    dtype: Dtype,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    pad: str = "hbm",
) -> jax.Array:
    """Adapter for ops.pallas_attention.fused_attention_packed — the
    TRAINING kernel (fp32 softmax + in-kernel dropout + recompute
    backward) on the packed (B, N, H*Dh) layout, so the (B, H, N, D)
    transposes of fused_dot_product_attention disappear (~20 ms/step of
    copy/pad fusions at B=64 in the round-2 train trace). pad="none"
    feeds the ragged token dim straight in (no HBM pad copies around
    fwd AND bwd; the kernels are shape-generic — proven on-chip at
    eval, +35 clips/s)."""
    from triad_tpu.ops.pallas_attention import fused_attention_packed

    b, n, h, d = q.shape
    sm_scale = float(1.0 / np.sqrt(d))

    if dropout_rate > 0.0 and dropout_rng is not None:
        seed = _dropout_seed(dropout_rng)
    else:
        seed = jnp.zeros((), jnp.int32)
        dropout_rate = 0.0

    if pad == "none":
        def flat(x):
            return x.reshape(b, n, h * d).astype(dtype)

        key_mask = (
            mask.reshape(b, n).astype(jnp.float32)
            if mask is not None else jnp.ones((b, n), jnp.float32)
        )
        out = fused_attention_packed(
            flat(q), flat(k), flat(v), key_mask, seed,
            float(dropout_rate), sm_scale,
        )
        return out.reshape(b, n, h, d)

    nq_pad = _round_up(n, 8)
    nk_pad = _round_up(n, 128)

    def packed(x, n_to):
        x = x.reshape(b, n, h * d).astype(dtype)
        if n_to != n:
            x = jnp.pad(x, ((0, 0), (0, n_to - n), (0, 0)))
        return x

    if mask is not None:
        key_mask = mask.reshape(b, n).astype(jnp.float32)
    else:
        key_mask = jnp.ones((b, n), jnp.float32)
    if nk_pad != n:
        key_mask = jnp.pad(key_mask, ((0, 0), (0, nk_pad - n)))

    out = fused_attention_packed(
        packed(q, nq_pad), packed(k, nk_pad), packed(v, nk_pad),
        key_mask, seed, float(dropout_rate), sm_scale,
    )
    return out[:, :n].reshape(b, n, h, d)


def packed_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    dtype: Dtype,
    pair: bool = False,
    pad: str = "hbm",
) -> jax.Array:
    """Adapter for ops.pallas_attention.fused_attention_eval: keeps the
    projections' packed (B, N, H*Dh) layout (free reshapes, no
    (B, H, N, D) transposes), pads query rows to 8 and keys to 128
    (padded keys masked, padded query rows sliced off). Inference only —
    numerics match the scores_dtype=bfloat16 XLA path (bf16 probs, fp32
    max/sum, delayed normalization) without the (B, H, N, N) probs HBM
    round-trip.

    ``pair=True`` selects the head-PAIR block-diagonal inner loop
    (fused_attention_eval_pair): full-depth 128-contraction matmuls, no
    64-lane head slices, MXU-computed softmax denominators. Same
    semantics; an eval-throughput A/B candidate."""
    from triad_tpu.ops.pallas_attention import (
        fused_attention_eval,
        fused_attention_eval_pair,
    )

    b, n, h, d = q.shape
    if pair and d != 64:
        # The pair kernel packs TWO 64-wide heads into each 128-lane
        # window; other head dims would silently mis-slice.
        raise ValueError(f"pair eval kernel requires head_dim 64, got {d}")
    sm_scale = float(1.0 / np.sqrt(d))
    if pad == "none" and not pair:
        # Ragged token dim straight into the kernel: _head_eval is
        # shape-generic, the HBM pad copies (q/k/v (B, N_pad, H*D)
        # writes, ~1.8 ms/step at HuBERT B=64) and the output slice
        # disappear. Mosaic pads VMEM tiles internally; the pair
        # kernel's block-diagonal lane layout still needs real 128s.
        def flat(x):
            return x.reshape(b, n, h * d).astype(dtype)

        key_mask = (
            mask.reshape(b, n).astype(jnp.float32)
            if mask is not None else jnp.ones((b, n), jnp.float32)
        )
        out = fused_attention_eval(flat(q), flat(k), flat(v), key_mask,
                                   sm_scale)
        return out.reshape(b, n, h, d)
    nq_pad = _round_up(n, 8)
    nk_pad = _round_up(n, 128)

    def packed(x, n_to):
        x = x.reshape(b, n, h * d).astype(dtype)
        if n_to != n:
            x = jnp.pad(x, ((0, 0), (0, n_to - n), (0, 0)))
        return x

    if mask is not None:
        key_mask = mask.reshape(b, n).astype(jnp.float32)
    else:
        key_mask = jnp.ones((b, n), jnp.float32)
    if nk_pad != n:
        key_mask = jnp.pad(key_mask, ((0, 0), (0, nk_pad - n)))

    fn = fused_attention_eval_pair if pair else fused_attention_eval
    out = fn(
        packed(q, nq_pad), packed(k, nk_pad), packed(v, nk_pad),
        key_mask, sm_scale,
    )
    return out[:, :n].reshape(b, n, h, d)


def merged_packed_dot_product_attention(
    qkv: jax.Array,
    mask: Optional[jax.Array],
    dtype: Dtype,
    head_dim: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    differentiable: bool = False,
    pair: bool = False,
    pad: str = "hbm",
) -> jax.Array:
    """Adapter for the MERGED-qkv pallas kernels: the caller computes
    q|k|v as ONE (C, 3C) projection matmul and this function dispatches
    its (B, N, 3*H*Dh) output straight into a kernel that reads q, k
    and v at lane offsets — no (B, N, C) split slices ever materialize
    (the layout copies that made the round-1 merged-qkv attempt lose,
    models/hubert.py round-1 note). Dropout active -> the training
    kernel (fp32 softmax, in-kernel replayed-PRNG dropout, merged
    d(qkv) cotangent); otherwise the delayed-normalization eval kernel,
    UNLESS ``differentiable`` — the eval kernel has no VJP, so a
    dropout-free caller that still needs d(qkv) (e.g. the LoRA ViT in
    training, where DINOv2 has no attention dropout but the qkv
    adapters train) gets the p=0 training kernel instead.

    qkv: (B, N, 3*H*Dh); mask: optional (B, N) key mask (1 = attend).
    Returns (B, N, H*Dh).
    """
    from triad_tpu.ops.pallas_attention import (
        fused_attention_eval_merged,
        fused_attention_eval_merged_pair,
        fused_attention_packed_merged,
    )

    b, n, hd3 = qkv.shape
    if head_dim != 64:
        # The merged kernels slice heads as 64-wide lane windows; a
        # different head_dim would silently fuse/truncate heads (and
        # apply the wrong sm_scale). Raise instead of mis-computing.
        raise ValueError(
            f"merged attention kernels require head_dim == 64, got "
            f"{head_dim} (use the xla/fused impls for other head dims)"
        )
    if hd3 % (3 * 64) != 0:
        raise ValueError(f"bad merged qkv width {hd3} (not 3*H*64)")
    sm_scale = float(1.0 / np.sqrt(head_dim))
    live_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if pad == "none" and not pair:
        # Ragged N straight into the kernels (no (B, N_pad, 3C) HBM
        # pad copy — ~2.8 ms/step across the 12 ViT layers at B=64,
        # 261 -> 384 — and no output slice). On-chip proven
        # (scripts/tpu_attnpad_check.py, r4 run): bit-exact at eval
        # (+35 clips/s, r3d bench_attnpad), bit-exact for the merged
        # TRAINING kernel's fwd + d(qkv) at p=0 (the r3g NaN suspect —
        # cleared; the r4 e2e NaN reproduced on the UNMERGED set too,
        # exonerating this kernel), and finite/moment-sane for the
        # live-dropout fwd AND backward across a seed sweep (the
        # in-kernel PRNG stream at unaligned lane counts).
        key_mask = (
            mask.reshape(b, n).astype(jnp.float32)
            if mask is not None else jnp.ones((b, n), jnp.float32)
        )
        qkv = qkv.astype(dtype)
        if live_dropout:
            return fused_attention_packed_merged(
                qkv, key_mask, _dropout_seed(dropout_rng),
                float(dropout_rate), sm_scale,
            )
        if differentiable:
            return fused_attention_packed_merged(
                qkv, key_mask, jnp.int32(0), 0.0, sm_scale
            )
        return fused_attention_eval_merged(qkv, key_mask, sm_scale)
    n_pad = _round_up(n, 128)  # shared q/k padding in the merged layout
    qkv = qkv.astype(dtype)
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
    if mask is not None:
        key_mask = mask.reshape(b, n).astype(jnp.float32)
    else:
        key_mask = jnp.ones((b, n), jnp.float32)
    if n_pad != n:
        key_mask = jnp.pad(key_mask, ((0, 0), (0, n_pad - n)))

    if dropout_rate > 0.0 and dropout_rng is not None:
        seed = _dropout_seed(dropout_rng)
        out = fused_attention_packed_merged(
            qkv, key_mask, seed, float(dropout_rate), sm_scale
        )
    elif differentiable:
        out = fused_attention_packed_merged(
            qkv, key_mask, jnp.int32(0), 0.0, sm_scale
        )
    elif pair:
        out = fused_attention_eval_merged_pair(qkv, key_mask, sm_scale)
    else:
        out = fused_attention_eval_merged(qkv, key_mask, sm_scale)
    return out[:, :n]


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    dtype: Dtype,
    scores_dtype: Dtype = jnp.float32,
    probs_dropout=None,
    impl: str = "xla",
    eval_pad: str = "hbm",
) -> jax.Array:
    """Standard softmax attention.

    q, k, v: (B, N, H, Dh). mask: optional (B, 1, 1, Nk) boolean mask
    (True = attend).

    scores_dtype float32 (default): fp32 scores + softmax — the
    reference's autocast behavior (torch softmax promotes to fp32).
    scores_dtype bfloat16: scores stay bf16 with a max-subtracted exp —
    ~20% faster on TPU (halves the score-matrix HBM traffic), output
    differs at bf16 rounding (production knob, off for parity).

    impl "flash": fused pallas kernel (flash_dot_product_attention);
    falls back to XLA when probs_dropout is active (the fused kernel has
    no in-kernel dropout) — i.e. flash serves eval always and training
    whenever attention_dropout == 0.
    """
    if impl not in ("xla", "flash", "packed", "packed_pair"):
        # Unknown names must not silently fall through to the XLA body:
        # impl strings arrive from env-var A/B knobs (TRIAD_BENCH_*_ATTN)
        # and a typo would mislabel a hardware measurement as a kernel
        # number (same rationale as PositionalConvEmbedding's guard).
        raise ValueError(
            f"unknown attention impl {impl!r} (expected xla, flash, "
            f"packed or packed_pair here; fused/packed/merged variants "
            f"dispatch in the encoder modules)"
        )
    if impl == "flash" and probs_dropout is None:
        return flash_dot_product_attention(q, k, v, mask, dtype)
    if impl in ("packed", "packed_pair") and probs_dropout is None:
        return packed_dot_product_attention(
            q, k, v, mask, dtype, pair=impl == "packed_pair", pad=eval_pad
        )
    depth = q.shape[-1]
    scale = jnp.asarray(1.0 / jnp.sqrt(depth), dtype)
    if jnp.dtype(scores_dtype) == jnp.float32:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        scores = scores.astype(jnp.float32)
        if mask is not None:
            scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        if probs_dropout is not None:
            probs = probs_dropout(probs)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=scores_dtype
    )
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.asarray(-1e4, scores_dtype))
    m = jax.lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
    e = jnp.exp((scores - m).astype(jnp.float32)).astype(dtype)
    probs = e / jnp.sum(e, axis=-1, keepdims=True).astype(dtype)
    if probs_dropout is not None:
        probs = probs_dropout(probs)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class LoRADense(nn.Module):
    """Dense layer with an optional LoRA adapter: y = xW + b + (α/r)·xAB.

    Mirrors peft LoRA on the reference ViT (model.py:235-248: r=8, α=16,
    dropout 0, applied to the fused qkv and the attention output proj).
    A is He-uniform initialized, B zeros, so the adapter starts as a
    no-op (peft default init).
    """

    features: int
    rank: int = 0
    alpha: float = 16.0
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # "folded" (default): y = x @ (W + s·A@B) — the adapter is merged
    # into the base kernel each call (one 768x768xR matmul, ~10 MFLOP)
    # so the activation makes ONE pass through the MXU instead of three.
    # "separate": peft-shaped x@W + s·(x@A)@B (bit-parity with torch
    # peft; fp32 association differences are ~1e-6).
    lora_compute: str = "folded"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            self.param_dtype,
        )
        lora_a = lora_b = None
        if self.rank > 0:
            lora_a = self.param(
                "lora_a",
                nn.initializers.he_uniform(),
                (in_features, self.rank),
                self.param_dtype,
            )
            lora_b = self.param(
                "lora_b",
                nn.initializers.zeros,
                (self.rank, self.features),
                self.param_dtype,
            )
        if self.rank > 0 and self.lora_compute == "folded":
            scaling = jnp.asarray(self.alpha / self.rank, self.param_dtype)
            w = kernel + scaling * jnp.dot(lora_a, lora_b)
            y = jnp.dot(x, w.astype(self.dtype))
        else:
            y = jnp.dot(x, kernel.astype(self.dtype))
            if self.rank > 0:
                scaling = jnp.asarray(self.alpha / self.rank, self.dtype)
                y = y + scaling * jnp.dot(
                    jnp.dot(x, lora_a.astype(self.dtype)),
                    lora_b.astype(self.dtype),
                )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class DenseParams(nn.Module):
    """Owns nn.Dense-identical params ({kernel, bias}) without running
    the Dense computation — fused kernels consume them directly. Param
    tree paths match nn.Dense exactly (checkpoint/port compatible)."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return kernel, bias


class NormParams(nn.Module):
    """Owns nn.LayerNorm-identical params ({scale, bias}) without
    running the normalization — fused kernels consume them directly.
    Param tree paths match nn.LayerNorm exactly."""

    dim: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.dim,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.dim,), self.param_dtype
        )
        return scale, bias


class Mlp(nn.Module):
    """Transformer FFN: Dense -> GELU -> Dense.

    impl "fused": single pallas fc1+gelu+fc2 kernel (ops/pallas_mlp.py,
    p=0 path — measured ~13 ms faster than XLA's unfused erf-gelu
    pipeline on HuBERT shapes at B=64). Same params, same numerics to
    bf16 rounding. "xla" keeps the reference-shaped Dense/gelu/Dense.
    """

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # HF-style "exact" gelu vs tanh approximation; all three reference
    # backbones use exact gelu.
    approximate_gelu: bool = False
    impl: str = "xla"
    # GELU form inside the fused kernel: "erf" (parity) or "tanh"
    # (cheaper VPU transcendental, <=4.7e-4 abs err).
    gelu: str = "erf"
    # Batch rows merged per fused-kernel grid step (1 = off).
    block_rows: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.impl == "fused" and not self.approximate_gelu:
            from triad_tpu.ops.pallas_mlp import fused_mlp

            in_features = x.shape[-1]
            w1, b1 = DenseParams(
                self.hidden_features, param_dtype=self.param_dtype, name="fc1"
            )(in_features)
            w2, b2 = DenseParams(
                self.out_features, param_dtype=self.param_dtype, name="fc2"
            )(self.hidden_features)
            return fused_mlp(
                x.astype(self.dtype),
                w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype),
                jnp.zeros((), jnp.int32), 0.0, self.gelu, self.block_rows,
            )
        x = nn.Dense(
            self.hidden_features, dtype=self.dtype, param_dtype=self.param_dtype,
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=self.approximate_gelu)
        x = nn.Dense(
            self.out_features, dtype=self.dtype, param_dtype=self.param_dtype,
            name="fc2",
        )(x)
        return x


class ProjectionHead(nn.Module):
    """The reference's shared projection pattern (model.py:32-34, 81-83,
    253-255): Linear(hidden -> 512) -> LayerNorm -> Linear(512 -> 512).

    LayerNorm eps matches torch's default (1e-5).
    """

    embedding_dim: int = 512
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(
            self.embedding_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="projection1",
        )(x)
        x = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype,
            name="layer_norm",
        )(x)
        x = nn.Dense(
            self.embedding_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="projection2",
        )(x)
        return x


def patch_dropout_mask(
    rng: jax.Array, shape: tuple, drop_rate: float
) -> jax.Array:
    """Bernoulli keep-mask for token dropout.

    TPU-idiomatic analog of the reference's physical token removal
    (model.py:268-308): instead of gathering kept tokens per sample and
    re-padding to the ragged batch max (shape-dynamic), we zero dropped
    tokens. Under max-mean aggregation a zero token contributes sim 0,
    exactly like the reference's zero-padding rows; eval mode is
    identical (dropout off, model.py:275).
    """
    return jax.random.bernoulli(rng, 1.0 - drop_rate, shape)
