"""Fused Pallas TPU attention with in-kernel dropout.

Why this exists: the training-step profile (B=64, 10 s audio) showed
HuBERT's attention-probs pipeline at ~210 ms/step — fp32 scores,
softmax, an HBM-materialized (B, H, T, T) dropout mask, and their
backward/remat traffic (the reference trains with HF's
attention_dropout=0.1 active, so eval-only flash kernels don't apply).
This kernel keeps the whole (T, T) tile pipeline in VMEM:

  forward : S = (Q·s)·Kᵀ (fp32 accum) → key-mask → softmax → dropout
            mask drawn from the per-core PRNG (pltpu.prng_random_bits)
            → P·V, one batch element per grid step, heads looped
            in-kernel (amortizes the per-instance overhead that makes
            per-(b,h) grids slow at these shapes).
  backward: custom VJP, flash-style recompute — S and P are rebuilt and
            the SAME dropout bits are replayed (same seed, same
            per-head generation order), so nothing probs-sized ever
            lives in HBM:
              dD = dO·Vᵀ ; dP = dD∘keep/(1-p) ; D = P∘keep/(1-p)
              dV = Dᵀ·dO ; dS = P∘(dP − rowsum(dP∘P)) ; dQ = dS·K·s ;
              dK = dSᵀ·Q·s.

Semantics match the XLA path in models/layers.py (fp32 scores + softmax,
Bernoulli(1-p) keep, 1/(1-p) scaling); the dropout mask itself comes
from the TPU core PRNG instead of jax.random — same distribution,
different stream (dropout is noise, not a checkpointable contract).

Intended for T up to ~1024 (full-T tiles in VMEM: T=512 uses ~4 MB of
fp32 scratch per head). The model's sequences are HuBERT 499→512 and
ViT 261→384 after 128-padding; padded keys are masked, padded query
rows are sliced off by the caller (models/layers.py adapter).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _keep_mask(shape, p_drop: float):
    """Bernoulli(1-p) keep mask from the seeded per-core PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # keep <=> bits >= p * 2^32 (uint32 compare; P(bits < t) = t / 2^32)
    threshold = np.uint32(min(int(p_drop * (1 << 32)), (1 << 32) - 1))
    return bits >= threshold


def _softmax_f32(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


# Shared per-head math. Every training kernel below (strided (B,H,T,D),
# packed (B,N,H*D), merged (B,N,3*H*D)) runs these exact bodies per
# head — the kernels differ ONLY in where q/k/v tiles are sliced from
# and where outputs are written. One copy of the math means a numerics
# fix cannot desynchronize the variants. PRNG discipline: each helper
# draws at most ONE keep mask per call, so the per-(batch, head)
# generation order is the loop order of the calling kernel.


def _head_eval(q, k, v, key_bias, sm_scale: float):
    """Delayed-normalization inference attention for one head: the
    (Nq, Nk) probs are never divided — the row sums divide the (Nq, D)
    output instead (Nk/D fewer divides), and the un-normalized exp goes
    through the MXU at the input dtype. Returns (Nq, D) fp32."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale + key_bias[None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)  # fp32 transient (packed bf16 VPU math
    # measured slower than fp32 in the frontend kernel)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(  # un-normalized P·V, fp32 accum
        e.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return o * (1.0 / denom)


def _head_pair_eval(qp, kp, vp, key_bias, sm_scale: float):
    """Delayed-normalization inference attention for TWO heads at once,
    on 128-lane-aligned pair slices (d == 64).

    The per-head 64-lane slices of ``_head_eval`` are Mosaic-hostile
    (every odd head loads/stores at a 64-lane offset) and its per-head
    matmuls run at half MXU depth (contraction 64). This variant keeps
    everything 128-aligned via a block-diagonal layout built with
    elementwise lane masks (no narrow slices anywhere):

      kblk (2Nk, 128) = [kp∘m0 ; kp∘m1]  =>  S = qp·kblkᵀ (Nq, 2Nk)
      is [S_h0 | S_h1] in one FULL-depth (128) matmul (2x zero-FLOPs,
      still ~MXU-free at these sizes);
      vblk likewise => P·V for both heads in one contraction-2Nk matmul;
      the softmax DENOMINATORS come from a third matmul against a
      block mask (the MXU does the row sums, pre-broadcast across each
      head's 64 output lanes, replacing the VPU lane-reductions).

    Max subtraction stays per (row, head) — exactly the original
    robustness (denominators >= 1; a global max could underflow a
    quiet head's whole row). qp/kp/vp: (N, 128); key_bias: (Nk,) f32.
    Returns (Nq, 128) fp32 = [O_h0 | O_h1].
    """
    nk, w = kp.shape
    d = w // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    m0 = (lane < d).astype(kp.dtype)
    m1 = (lane >= d).astype(kp.dtype)
    kblk = jnp.concatenate([kp * m0, kp * m1], axis=0)  # (2Nk, 128)
    s = jax.lax.dot_general(
        qp, kblk, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale  # (Nq, 2Nk) = [S0 | S1]
    # 2-D lane concat: the 1-D (Nk,)->(2Nk,) form hit Mosaic's "Input
    # offsets outside of the first tile" on the real chip (round 3).
    bias2 = jnp.concatenate(
        [key_bias[None, :], key_bias[None, :]], axis=1
    )  # (1, 2Nk)
    s = s + bias2
    s0 = s[:, :nk]  # 128-aligned lane slices (nk % 128 == 0)
    s1 = s[:, nk:]
    e = jnp.concatenate(
        [
            jnp.exp(s0 - jnp.max(s0, axis=-1, keepdims=True)),
            jnp.exp(s1 - jnp.max(s1, axis=-1, keepdims=True)),
        ],
        axis=1,
    ).astype(vp.dtype)  # (Nq, 2Nk) un-normalized probs
    vblk = jnp.concatenate([vp * m0, vp * m1], axis=0)  # (2Nk, 128)
    o = jax.lax.dot_general(
        e, vblk, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Nq, 128) = [O0 | O1] un-normalized
    oneblk = jnp.concatenate(
        [
            jnp.broadcast_to(m0, (nk, w)),
            jnp.broadcast_to(m1, (nk, w)),
        ],
        axis=0,
    )  # (2Nk, 128) block mask
    denom = jax.lax.dot_general(
        e, oneblk, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Nq, 128): row sums, pre-broadcast per head half
    return o / denom


def _head_fwd(q, k, v, key_bias, p_drop: float, sm_scale: float):
    """softmax((q·s)·kᵀ + bias) [dropout] · v for one head; fp32 accum.

    Returns the (Nq, D) fp32 output (caller casts to the output dtype).
    """
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    p = _softmax_f32(s + key_bias[None, :])
    if p_drop > 0.0:
        keep = _keep_mask(p.shape, p_drop)
        p = jnp.where(keep, p * (1.0 / (1.0 - p_drop)), 0.0)
    return jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _head_bwd(q, k, v, do, key_bias, p_drop: float, sm_scale: float):
    """Flash-style recompute backward for one head (same replayed
    dropout bits as _head_fwd for the same PRNG state):

      dD = dO·Vᵀ ; D = P∘keep/(1-p) ; dP = dD∘keep/(1-p)
      dV = Dᵀ·dO ; dS = P∘(dP − rowsum(dP∘P)) ; dQ = dS·K·s ; dK = dSᵀ·Q·s

    Returns (dq, dk, dv) as fp32 (caller casts and writes).
    """
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    p = _softmax_f32(s + key_bias[None, :])
    dmat = jax.lax.dot_general(  # dD = dO · Vᵀ
        do, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if p_drop > 0.0:
        inv_keep = 1.0 / (1.0 - p_drop)
        keep = _keep_mask(p.shape, p_drop)
        dropped = jnp.where(keep, p * inv_keep, 0.0)
        dp = jnp.where(keep, dmat * inv_keep, 0.0)
    else:
        dropped = p
        dp = dmat
    dv = jax.lax.dot_general(  # Dᵀ · dO
        dropped, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    di = jnp.sum(dp * p, axis=1, keepdims=True)
    ds = p * (dp - di)
    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sm_scale
    return dq, dk, dv


def _fwd_kernel(
    seed_ref,  # SMEM (1, 1) int32
    q_ref, k_ref, v_ref,  # VMEM (1, H, T, D)
    mask_ref,  # VMEM (1, 1, T) f32 (key mask, 1 = attend)
    o_ref,  # out VMEM (1, H, T, D)
    *, h: int, p_drop: float, sm_scale: float,
):
    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    neg = jnp.float32(-1e30)
    key_bias = (1.0 - mask_ref[0, 0]) * neg  # (T,)
    for hh in range(h):
        o = _head_fwd(
            q_ref[0, hh], k_ref[0, hh], v_ref[0, hh], key_bias,
            p_drop, sm_scale,
        )
        o_ref[0, hh] = o.astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref,
    q_ref, k_ref, v_ref, mask_ref, do_ref,
    dq_ref, dk_ref, dv_ref,  # out VMEM (1, H, T, D)
    *, h: int, p_drop: float, sm_scale: float,
):
    if p_drop > 0.0:
        # Same seed and same per-head generation order as the forward —
        # the replayed bits are identical.
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    neg = jnp.float32(-1e30)
    key_bias = (1.0 - mask_ref[0, 0]) * neg
    for hh in range(h):
        dq, dk, dv = _head_bwd(
            q_ref[0, hh], k_ref[0, hh], v_ref[0, hh],
            do_ref[0, hh].astype(jnp.float32), key_bias, p_drop, sm_scale,
        )
        dq_ref[0, hh] = dq.astype(dq_ref.dtype)
        dk_ref[0, hh] = dk.astype(dk_ref.dtype)
        dv_ref[0, hh] = dv.astype(dv_ref.dtype)


def _specs(b, h, t, d):
    blk = pl.BlockSpec((1, h, t, d), lambda i: (i, 0, 0, 0))
    return blk


def _fwd(q, k, v, mask, seed, p_drop, sm_scale):
    b, h, t, d = q.shape
    blk = _specs(b, h, t, d)
    # (B, 1, T) mask: trailing block dims equal the array dims (the TPU
    # (8, 128) block-shape rule rejects a (1, T) block of a (B, T) array).
    mask_blk = pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0))
    mask = mask.reshape(b, 1, t)
    seed2d = seed.astype(jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, h=h, p_drop=p_drop, sm_scale=sm_scale
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            blk, blk, blk, mask_blk,
        ],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed2d, q, k, v, mask)


def _bwd(q, k, v, mask, seed, p_drop, sm_scale, do):
    b, h, t, d = q.shape
    blk = _specs(b, h, t, d)
    mask_blk = pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0))
    mask = mask.reshape(b, 1, t)
    seed2d = seed.astype(jnp.int32).reshape(1, 1)
    out_shape = jax.ShapeDtypeStruct((b, h, t, d), q.dtype)
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, h=h, p_drop=p_drop, sm_scale=sm_scale
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            blk, blk, blk, mask_blk, blk,
        ],
        out_specs=[blk, blk, blk],
        out_shape=[out_shape, out_shape, out_shape],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed2d, q, k, v, mask, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention(q, k, v, mask, seed, p_drop: float, sm_scale: float):
    """O = dropout(softmax(mask(Q·Kᵀ·s)))·V, fully fused.

    q, k, v: (B, H, T, D); mask: (B, T) key mask (1 = attend);
    seed: int32 scalar (ignored when p_drop == 0). T must be a multiple
    of 128 (pad + mask — see models/layers.py adapter); D should be a
    multiple of 64 (the model's head dim).
    """
    return _fwd(q, k, v, mask, seed, p_drop, sm_scale)


def _fused_fwd(q, k, v, mask, seed, p_drop, sm_scale):
    o = _fwd(q, k, v, mask, seed, p_drop, sm_scale)
    return o, (q, k, v, mask, seed)


def _fused_bwd(p_drop, sm_scale, res, do):
    q, k, v, mask, seed = res
    dq, dk, dv = _bwd(q, k, v, mask, seed, p_drop, sm_scale, do)
    return dq, dk, dv, None, None


fused_attention.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Eval-path kernel: packed layout, delayed normalization, no dropout
# ---------------------------------------------------------------------------


def _eval_kernel(
    q_ref,  # VMEM (1, Nq_pad, H*D)
    k_ref, v_ref,  # VMEM (1, Nk_pad, H*D)
    bias_ref,  # VMEM (1, 1, Nk_pad) f32 additive key bias (0 or -1e30)
    o_ref,  # out VMEM (1, Nq_pad, H*D)
    *, h: int, d: int, sm_scale: float,
):
    key_bias = bias_ref[0, 0]  # (Nk,) f32
    for hh in range(h):
        sl = slice(hh * d, (hh + 1) * d)
        o = _head_eval(
            q_ref[0][:, sl], k_ref[0][:, sl], v_ref[0][:, sl],
            key_bias, sm_scale,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def fused_attention_eval(q, k, v, mask, sm_scale: float):
    """Inference attention, one VMEM-resident program per batch row.

    q: (B, Nq_pad, H*D); k, v: (B, Nk_pad, H*D) — the PACKED projection
    output layout (a free reshape of (B, N, H, Dh); no (B, H, N, D)
    transposes on either side, which cost the training kernel ~4 ms/step
    at B=64 HuBERT shapes). mask: (B, Nk_pad) f32 key mask (1 = attend).

    Delayed normalization: the (Nq, Nk) probs are never divided — the
    row sums divide the (Nq, D) output instead (Nk/D fewer divides), and
    the un-normalized exp goes through the MXU at bf16. This is exactly
    the trick XLA's bf16-scores lowering uses; the kernel's win is the
    (B, H, Nq, Nk) probs tensor never reaching HBM (~0.9 ms/layer at
    B=64, Na=499). Requires Nq_pad % 8 == 0, Nk_pad % 128 == 0; padded
    keys are masked here, padded query rows are garbage the caller
    slices off.
    """
    b, nq, hd = q.shape
    nk = k.shape[1]
    h = hd // 64 if hd % 64 == 0 else None
    # head dim is always 64 in this model family; assert loudly.
    assert h is not None, f"packed width {hd} not a multiple of 64"
    bias = (1.0 - mask.astype(jnp.float32)) * jnp.float32(-1e30)
    bias = bias.reshape(b, 1, nk)
    qblk = pl.BlockSpec((1, nq, hd), lambda i: (i, 0, 0))
    kblk = pl.BlockSpec((1, nk, hd), lambda i: (i, 0, 0))
    bias_blk = pl.BlockSpec((1, 1, nk), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_eval_kernel, h=h, d=64, sm_scale=sm_scale),
        grid=(b,),
        in_specs=[qblk, kblk, kblk, bias_blk],
        out_specs=qblk,
        out_shape=jax.ShapeDtypeStruct((b, nq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v, bias)


def _eval_pair_kernel(
    q_ref, k_ref, v_ref,  # VMEM (1, N_pad, H*D)
    bias_ref,  # VMEM (1, 1, Nk_pad) f32
    o_ref,  # out VMEM (1, Nq_pad, H*D)
    *, h: int, d: int, sm_scale: float,
):
    key_bias = bias_ref[0, 0]
    for hp in range(h // 2):
        sl = slice(hp * 2 * d, (hp + 1) * 2 * d)  # 128-aligned
        o = _head_pair_eval(
            q_ref[0][:, sl], k_ref[0][:, sl], v_ref[0][:, sl],
            key_bias, sm_scale,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)
    if h % 2:
        sl = slice((h - 1) * d, h * d)
        o = _head_eval(
            q_ref[0][:, sl], k_ref[0][:, sl], v_ref[0][:, sl],
            key_bias, sm_scale,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def fused_attention_eval_pair(q, k, v, mask, sm_scale: float):
    """fused_attention_eval with the head-PAIR block-diagonal inner
    loop (_head_pair_eval): full-depth matmuls, no 64-lane slices,
    MXU-computed softmax denominators. Same signature/semantics.

    STATUS (round 3, real chip, scripts/tpu_r3_kernels_check.py attn):
    RETIRED as a default candidate — numerically correct on hardware
    (max 5e-4 vs XLA) but NEUTRAL-TO-SLOWER at both production shapes:
    hubert (64,499) 6.78 vs 6.76 ms single-head, vit merged (64,261)
    7.70 vs 6.39 ms. The block-diagonal layout doubles the P·V FLOPs
    and adds the denominator matmul; at d=64/N<=499 that exceeds what
    the 128-lane alignment saves. Kept for re-evaluation at longer
    sequences where the zero-FLOP fraction amortizes."""
    b, nq, hd = q.shape
    nk = k.shape[1]
    assert hd % 64 == 0, f"packed width {hd} not a multiple of 64"
    bias = (1.0 - mask.astype(jnp.float32)) * jnp.float32(-1e30)
    bias = bias.reshape(b, 1, nk)
    qblk = pl.BlockSpec((1, nq, hd), lambda i: (i, 0, 0))
    kblk = pl.BlockSpec((1, nk, hd), lambda i: (i, 0, 0))
    bias_blk = pl.BlockSpec((1, 1, nk), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _eval_pair_kernel, h=hd // 64, d=64, sm_scale=sm_scale
        ),
        grid=(b,),
        in_specs=[qblk, kblk, kblk, bias_blk],
        out_specs=qblk,
        out_shape=jax.ShapeDtypeStruct((b, nq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v, bias)


def _eval_merged_pair_kernel(
    qkv_ref,  # VMEM (1, N_pad, 3*H*D) packed [q | k | v]
    bias_ref,  # VMEM (1, 1, N_pad) f32
    o_ref,  # out VMEM (1, N_pad, H*D)
    *, h: int, d: int, sm_scale: float,
):
    hd = h * d
    key_bias = bias_ref[0, 0]
    for hp in range(h // 2):
        sl = slice(hp * 2 * d, (hp + 1) * 2 * d)
        o = _head_pair_eval(
            qkv_ref[0][:, sl],
            qkv_ref[0][:, hd + hp * 2 * d : hd + (hp + 1) * 2 * d],
            qkv_ref[0][:, 2 * hd + hp * 2 * d : 2 * hd + (hp + 1) * 2 * d],
            key_bias, sm_scale,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)
    if h % 2:
        o = _head_eval(
            qkv_ref[0][:, (h - 1) * d : h * d],
            qkv_ref[0][:, hd + (h - 1) * d : hd + h * d],
            qkv_ref[0][:, 2 * hd + (h - 1) * d : 2 * hd + h * d],
            key_bias, sm_scale,
        )
        o_ref[0, :, (h - 1) * d : h * d] = o.astype(o_ref.dtype)


def fused_attention_eval_merged_pair(qkv, mask, sm_scale: float):
    """fused_attention_eval_merged with the head-pair inner loop."""
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    assert hd * 3 == hd3 and hd % 64 == 0, f"bad merged width {hd3}"
    bias = (1.0 - mask.astype(jnp.float32)) * jnp.float32(-1e30)
    bias = bias.reshape(b, 1, n)
    return pl.pallas_call(
        functools.partial(
            _eval_merged_pair_kernel, h=hd // 64, d=64, sm_scale=sm_scale
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, hd3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv, bias)


# ---------------------------------------------------------------------------
# Packed-layout TRAINING kernel: same math as fused_attention (fp32
# softmax + in-kernel dropout + flash-style recompute backward), but on
# the projections' native packed (B, N, H*D) layout — the (B, H, N, D)
# transposes around the original kernel cost ~20 ms/step at B=64 in the
# round-2 train trace (copy/slice_bitcast/pad fusions).
# ---------------------------------------------------------------------------


def _pk_fwd_kernel(
    seed_ref,  # SMEM (1, 1) int32
    q_ref,  # VMEM (1, Nq, H*D)
    k_ref, v_ref,  # VMEM (1, Nk, H*D)
    bias_ref,  # VMEM (1, 1, Nk) f32 additive key bias
    o_ref,  # out VMEM (1, Nq, H*D)
    *, h: int, d: int, p_drop: float, sm_scale: float,
):
    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    key_bias = bias_ref[0, 0]
    for hh in range(h):
        sl = slice(hh * d, (hh + 1) * d)
        o = _head_fwd(
            q_ref[0][:, sl], k_ref[0][:, sl], v_ref[0][:, sl], key_bias,
            p_drop, sm_scale,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _pk_bwd_kernel(
    seed_ref,
    q_ref, k_ref, v_ref, bias_ref, do_ref,
    dq_ref, dk_ref, dv_ref,  # out VMEM packed
    *, h: int, d: int, p_drop: float, sm_scale: float,
):
    if p_drop > 0.0:
        # Same seed, same per-head order => identical replayed bits.
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    key_bias = bias_ref[0, 0]
    for hh in range(h):
        sl = slice(hh * d, (hh + 1) * d)
        dq, dk, dv = _head_bwd(
            q_ref[0][:, sl], k_ref[0][:, sl], v_ref[0][:, sl],
            do_ref[0][:, sl].astype(jnp.float32), key_bias, p_drop, sm_scale,
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _pk_call(kind, q, k, v, bias, seed, p_drop, sm_scale, do=None):
    b, nq, hd = q.shape
    nk = k.shape[1]
    h = hd // 64
    seed2d = seed.astype(jnp.int32).reshape(1, 1)
    qblk = pl.BlockSpec((1, nq, hd), lambda i: (i, 0, 0))
    kblk = pl.BlockSpec((1, nk, hd), lambda i: (i, 0, 0))
    bias_blk = pl.BlockSpec((1, 1, nk), lambda i: (i, 0, 0))
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if kind == "fwd":
        return pl.pallas_call(
            functools.partial(
                _pk_fwd_kernel, h=h, d=64, p_drop=p_drop, sm_scale=sm_scale
            ),
            grid=(b,),
            in_specs=[smem, qblk, kblk, kblk, bias_blk],
            out_specs=qblk,
            out_shape=jax.ShapeDtypeStruct((b, nq, hd), q.dtype),
            compiler_params=params,
        )(seed2d, q, k, v, bias)
    return pl.pallas_call(
        functools.partial(
            _pk_bwd_kernel, h=h, d=64, p_drop=p_drop, sm_scale=sm_scale
        ),
        grid=(b,),
        in_specs=[smem, qblk, kblk, kblk, bias_blk, qblk],
        out_specs=[qblk, kblk, kblk],
        out_shape=[
            jax.ShapeDtypeStruct((b, nq, hd), q.dtype),
            jax.ShapeDtypeStruct((b, nk, hd), k.dtype),
            jax.ShapeDtypeStruct((b, nk, hd), v.dtype),
        ],
        compiler_params=params,
    )(seed2d, q, k, v, bias, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_attention_packed(q, k, v, mask, seed, p_drop: float, sm_scale: float):
    """Training attention on packed (B, N, H*D) tensors: fp32 softmax +
    Bernoulli keep + 1/(1-p) scaling, flash-style recompute backward
    with replayed dropout bits — semantics identical to fused_attention,
    layout identical to the projections (no transposes). mask: (B, Nk)
    key mask (1 = attend). Nq % 8 == 0, Nk % 128 == 0 (pad + mask)."""
    bias = (1.0 - mask.astype(jnp.float32)) * jnp.float32(-1e30)
    bias = bias.reshape(q.shape[0], 1, k.shape[1])
    return _pk_call("fwd", q, k, v, bias, seed, p_drop, sm_scale)


def _pk_fwd(q, k, v, mask, seed, p_drop, sm_scale):
    o = fused_attention_packed(q, k, v, mask, seed, p_drop, sm_scale)
    return o, (q, k, v, mask, seed)


def _pk_bwd(p_drop, sm_scale, res, do):
    q, k, v, mask, seed = res
    bias = (1.0 - mask.astype(jnp.float32)) * jnp.float32(-1e30)
    bias = bias.reshape(q.shape[0], 1, k.shape[1])
    dq, dk, dv = _pk_call(
        "bwd", q, k, v, bias, seed, p_drop, sm_scale, do=do
    )
    return dq, dk, dv, None, None


fused_attention_packed.defvjp(_pk_fwd, _pk_bwd)


# ---------------------------------------------------------------------------
# MERGED-qkv variants: one (B, N, 3*H*D) tensor carries q|k|v.
#
# Why: with three separate projections, the three qkv matmuls each
# re-read the same (B, N, C) activation from HBM (~49 MB x 2 extra
# reads x 12 layers ~= 1.2 GB/step at B=64 HuBERT shapes) and XLA
# schedules three separate fusions per layer. A single (C, 3C) matmul
# reads the activation once — but round 1 measured the merge LOSING
# (419 vs 448 clips/s) because splitting the (B, N, 3C) output into
# the (B, H, N, D) operands XLA attention wants forced relayout copies
# on every slice. These kernels remove the split entirely: q, k, v are
# read from ONE ref at lane offsets (0, H*D, 2*H*D) inside the kernel,
# so nothing between the projection matmul and the attention output
# ever leaves the packed layout. Same math as the unmerged kernels
# above — literally: all six kernels call the shared _head_fwd /
# _head_bwd bodies. Dropout bits are drawn in the same per-(batch,
# head) order; the BITS match the unmerged kernels only when the
# padded query count also matches (the merged layout shares one
# 128-multiple N between q and k, the unmerged packed adapter pads
# queries to 8 — at HuBERT T=499 the streams diverge after head 0:
# 512x512 vs 504x512 draws). Dropout is noise, not a checkpoint
# contract; what matters (and holds unconditionally) is fwd==bwd
# replay WITHIN each kernel.
#
# The merged layout shares one N padding between queries and keys
# (128-multiple) vs the unmerged kernels' 8/128 split — at HuBERT
# shapes (499 -> 512 vs 504/512) that is +1.6% query rows, well under
# the saved HBM traffic.
# ---------------------------------------------------------------------------


def _eval_merged_kernel(
    qkv_ref,  # VMEM (1, N_pad, 3*H*D) packed [q | k | v]
    bias_ref,  # VMEM (1, 1, N_pad) f32 additive key bias
    o_ref,  # out VMEM (1, N_pad, H*D)
    *, h: int, d: int, sm_scale: float,
):
    hd = h * d
    key_bias = bias_ref[0, 0]
    for hh in range(h):
        o = _head_eval(
            qkv_ref[0][:, hh * d:(hh + 1) * d],
            qkv_ref[0][:, hd + hh * d:hd + (hh + 1) * d],
            qkv_ref[0][:, 2 * hd + hh * d:2 * hd + (hh + 1) * d],
            key_bias, sm_scale,
        )
        o_ref[0, :, hh * d:(hh + 1) * d] = o.astype(o_ref.dtype)


def fused_attention_eval_merged(qkv, mask, sm_scale: float):
    """Inference attention on a MERGED (B, N, 3*H*D) qkv tensor.

    Delayed-normalization math of fused_attention_eval, but q, k and v
    are lane slices of one projection output — the caller computes ONE
    (C, 3C) matmul and no split ever happens at the XLA level. mask:
    (B, N) f32 key mask (1 = attend); N % 128 == 0 (shared q/k
    padding); padded query rows are garbage the caller slices off.
    """
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    assert hd * 3 == hd3 and hd % 64 == 0, f"bad merged width {hd3}"
    bias = (1.0 - mask.astype(jnp.float32)) * jnp.float32(-1e30)
    bias = bias.reshape(b, 1, n)
    return pl.pallas_call(
        functools.partial(
            _eval_merged_kernel, h=hd // 64, d=64, sm_scale=sm_scale
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, hd3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv, bias)


def _pkm_fwd_kernel(
    seed_ref,  # SMEM (1, 1) int32
    qkv_ref,  # VMEM (1, N, 3*H*D)
    bias_ref,  # VMEM (1, 1, N)
    o_ref,  # out VMEM (1, N, H*D)
    *, h: int, d: int, p_drop: float, sm_scale: float,
):
    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    hd = h * d
    key_bias = bias_ref[0, 0]
    for hh in range(h):
        o = _head_fwd(
            qkv_ref[0][:, hh * d:(hh + 1) * d],
            qkv_ref[0][:, hd + hh * d:hd + (hh + 1) * d],
            qkv_ref[0][:, 2 * hd + hh * d:2 * hd + (hh + 1) * d],
            key_bias, p_drop, sm_scale,
        )
        o_ref[0, :, hh * d:(hh + 1) * d] = o.astype(o_ref.dtype)


def _pkm_bwd_kernel(
    seed_ref,
    qkv_ref, bias_ref, do_ref,
    dqkv_ref,  # out VMEM (1, N, 3*H*D)
    *, h: int, d: int, p_drop: float, sm_scale: float,
):
    if p_drop > 0.0:
        # Same seed, same per-(batch, head) generation order as the
        # merged forward => identical replayed bits. (Bits match the
        # UNMERGED _pk kernels only when the padded query count matches
        # — see fused_attention_packed_merged's docstring.)
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    hd = h * d
    key_bias = bias_ref[0, 0]
    for hh in range(h):
        dq, dk, dv = _head_bwd(
            qkv_ref[0][:, hh * d:(hh + 1) * d],
            qkv_ref[0][:, hd + hh * d:hd + (hh + 1) * d],
            qkv_ref[0][:, 2 * hd + hh * d:2 * hd + (hh + 1) * d],
            do_ref[0][:, hh * d:(hh + 1) * d].astype(jnp.float32),
            key_bias, p_drop, sm_scale,
        )
        dqkv_ref[0, :, hh * d:(hh + 1) * d] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, hd + hh * d:hd + (hh + 1) * d] = dk.astype(
            dqkv_ref.dtype
        )
        dqkv_ref[0, :, 2 * hd + hh * d:2 * hd + (hh + 1) * d] = dv.astype(
            dqkv_ref.dtype
        )


def _pkm_call(kind, qkv, bias, seed, p_drop, sm_scale, do=None):
    b, n, hd3 = qkv.shape
    hd = hd3 // 3
    h = hd // 64
    seed2d = seed.astype(jnp.int32).reshape(1, 1)
    qkvblk = pl.BlockSpec((1, n, hd3), lambda i: (i, 0, 0))
    oblk = pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0))
    bias_blk = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0))
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if kind == "fwd":
        return pl.pallas_call(
            functools.partial(
                _pkm_fwd_kernel, h=h, d=64, p_drop=p_drop, sm_scale=sm_scale
            ),
            grid=(b,),
            in_specs=[smem, qkvblk, bias_blk],
            out_specs=oblk,
            out_shape=jax.ShapeDtypeStruct((b, n, hd), qkv.dtype),
            compiler_params=params,
        )(seed2d, qkv, bias)
    return pl.pallas_call(
        functools.partial(
            _pkm_bwd_kernel, h=h, d=64, p_drop=p_drop, sm_scale=sm_scale
        ),
        grid=(b,),
        in_specs=[smem, qkvblk, bias_blk, oblk],
        out_specs=qkvblk,
        out_shape=jax.ShapeDtypeStruct((b, n, hd3), qkv.dtype),
        compiler_params=params,
    )(seed2d, qkv, bias, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention_packed_merged(
    qkv, mask, seed, p_drop: float, sm_scale: float
):
    """Training attention on a MERGED (B, N, 3*H*D) qkv tensor: fp32
    softmax + in-kernel Bernoulli dropout + flash-style recompute
    backward that emits ONE merged d(qkv) cotangent — the projection's
    weight gradient then runs as a single (C, 3C) matmul in XLA. Same
    math as fused_attention_packed (shared _head_fwd/_head_bwd bodies);
    dropout bits replay exactly between this kernel's own fwd and bwd,
    but match the unmerged kernel's only at equal padded query counts
    (see the section comment above). mask: (B, N) key mask (1 =
    attend); N % 128 == 0. Heads are 64-wide lane slices — callers go
    through models/layers.merged_packed_dot_product_attention, which
    validates head_dim == 64."""
    bias = (1.0 - mask.astype(jnp.float32)) * jnp.float32(-1e30)
    bias = bias.reshape(qkv.shape[0], 1, qkv.shape[1])
    return _pkm_call("fwd", qkv, bias, seed, p_drop, sm_scale)


def _pkm_fwd(qkv, mask, seed, p_drop, sm_scale):
    o = fused_attention_packed_merged(qkv, mask, seed, p_drop, sm_scale)
    return o, (qkv, mask, seed)


def _pkm_bwd(p_drop, sm_scale, res, do):
    qkv, mask, seed = res
    bias = (1.0 - mask.astype(jnp.float32)) * jnp.float32(-1e30)
    bias = bias.reshape(qkv.shape[0], 1, qkv.shape[1])
    dqkv = _pkm_call("bwd", qkv, bias, seed, p_drop, sm_scale, do=do)
    return dqkv, None, None


fused_attention_packed_merged.defvjp(_pkm_fwd, _pkm_bwd)
