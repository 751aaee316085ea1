"""Fused Pallas dropout + residual-add + LayerNorm.

The HuBERT post-LN block applies ``LN(x + dropout(sub(x)))`` twice per
layer (HF hidden_dropout on the attention output and the MLP output —
reference trains with p=0.1 active). In XLA each site costs a
(B, T, C) Bernoulli mask in HBM plus separate add/normalize passes, and
the backward replays the mask from HBM. This kernel keeps everything in
VMEM per batch row:

  forward : keep-mask from the per-core PRNG, s = x + keep·h/(1-p),
            fp32 mean/var over the feature dim, y = xhat·scale + bias.
  backward: custom VJP — replays the SAME mask (same seed, same order)
            and recomputes s/mean/rstd in-kernel (nothing but y leaves
            the forward), then emits dx, dh and per-row partial
            dscale/dbias that the wrapper sums across the grid.

Dropout semantics match nn.Dropout (Bernoulli keep, 1/(1-p) scale) with
the TPU core PRNG stream, like ops/pallas_mlp.py. At p=0 the kernel is
a fused add+LayerNorm (usable at eval).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from triad_tpu.ops.pallas_attention import _keep_mask


def _stats(s: jax.Array, eps: float):
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(s - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return mean, rstd


def _fwd_kernel(
    seed_ref,  # SMEM (1, 1) int32
    x_ref,  # VMEM (1, T, C)
    h_ref,  # VMEM (1, T, C)
    scale_ref,  # VMEM (1, C)
    bias_ref,  # VMEM (1, C)
    y_ref,  # out VMEM (1, T, C)
    *, p_drop: float, eps: float,
):
    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    x = x_ref[0].astype(jnp.float32)
    h = h_ref[0].astype(jnp.float32)
    if p_drop > 0.0:
        keep = _keep_mask(h.shape, p_drop)
        h = jnp.where(keep, h * (1.0 / (1.0 - p_drop)), 0.0)
    s = x + h
    mean, rstd = _stats(s, eps)
    xhat = (s - mean) * rstd
    y = xhat * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


def _bwd_kernel(
    seed_ref,
    x_ref, h_ref, scale_ref, dy_ref,
    dx_ref,  # out (1, T, C)
    dh_ref,  # out (1, T, C)
    dscale_ref,  # out (1, 1, C) per-row partial
    dbias_ref,  # out (1, 1, C) per-row partial
    *, p_drop: float, eps: float,
):
    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    x = x_ref[0].astype(jnp.float32)
    h = h_ref[0].astype(jnp.float32)
    if p_drop > 0.0:
        keep = _keep_mask(h.shape, p_drop)
        h = jnp.where(keep, h * (1.0 / (1.0 - p_drop)), 0.0)
    s = x + h
    mean, rstd = _stats(s, eps)
    xhat = (s - mean) * rstd
    dy = dy_ref[0].astype(jnp.float32)
    dyh = dy * scale_ref[0].astype(jnp.float32)
    m1 = jnp.mean(dyh, axis=-1, keepdims=True)
    m2 = jnp.mean(dyh * xhat, axis=-1, keepdims=True)
    ds = rstd * (dyh - m1 - xhat * m2)
    dx_ref[0] = ds.astype(dx_ref.dtype)
    if p_drop > 0.0:
        dh = jnp.where(keep, ds * (1.0 / (1.0 - p_drop)), 0.0)
    else:
        dh = ds
    dh_ref[0] = dh.astype(dh_ref.dtype)
    dscale_ref[0, 0] = jnp.sum(dy * xhat, axis=0).astype(dscale_ref.dtype)
    dbias_ref[0, 0] = jnp.sum(dy, axis=0).astype(dbias_ref.dtype)


def _row_spec(t: int, c: int):
    return pl.BlockSpec((1, t, c), lambda i: (i, 0, 0))


def _vec_spec(c: int):
    return pl.BlockSpec((1, c), lambda i: (0, 0))


def _merge_rows(block_rows: int, *arrays):
    """View (B, T, C) arrays as (B/rb, rb*T, C) — free in HBM. LN is
    per-row over C, so merging is exact; only the dropout bit stream
    moves (noise; fwd/bwd must share rb for replay). Same trick as
    ops/pallas_mlp._merge_rows — here the per-step work is tiny
    (~0.06 ms of bandwidth), so cutting grid steps rb-fold attacks the
    pipeline bubbles that made the rb=1 eval A/B lose (611.2 vs 616.1),
    with none of the MLP's VMEM blow-up."""
    b = arrays[0].shape[0]
    if block_rows <= 1 or b % block_rows:
        return arrays, b
    return (
        tuple(a.reshape(b // block_rows, block_rows * a.shape[1], a.shape[2])
              for a in arrays),
        b,
    )


def _fwd(x, h, scale, bias, seed, p_drop, eps, block_rows=1):
    (x, h), b_orig = _merge_rows(block_rows, x, h)
    b, t, c = x.shape
    seed2d = seed.astype(jnp.int32).reshape(1, 1)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, p_drop=p_drop, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            _row_spec(t, c), _row_spec(t, c), _vec_spec(c), _vec_spec(c),
        ],
        out_specs=_row_spec(t, c),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed2d, x, h, scale.reshape(1, c), bias.reshape(1, c))
    return y.reshape(b_orig, -1, c)


def _bwd_call(x, h, scale, seed, p_drop, eps, dy, block_rows=1):
    (x, h, dy), b_orig = _merge_rows(block_rows, x, h, dy)
    b, t, c = x.shape
    seed2d = seed.astype(jnp.int32).reshape(1, 1)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, p_drop=p_drop, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            _row_spec(t, c), _row_spec(t, c), _vec_spec(c), _row_spec(t, c),
        ],
        out_specs=[
            _row_spec(t, c), _row_spec(t, c),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, c), x.dtype),
            jax.ShapeDtypeStruct((b, t, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed2d, x, h, scale.reshape(1, c), dy)
    t_orig = t * b // b_orig
    return (
        out[0].reshape(b_orig, t_orig, c),
        out[1].reshape(b_orig, t_orig, c),
        # dscale/dbias partials stay (b_merged, 1, c): the wrapper only
        # sums them over (0, 1) — no un-merge needed.
        out[2],
        out[3],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_dropout_add_ln(x, h, scale, bias, seed, p_drop: float, eps: float,
                         block_rows: int = 1):
    """LayerNorm(x + dropout(h, p_drop)) fused per batch row.

    x, h: (B, T, C); scale, bias: (C,) (nn.LayerNorm-compatible); seed:
    int32 scalar (ignored at p_drop == 0). Stats in fp32 over C.
    block_rows merges rb batch rows per grid step (must divide B;
    silently 1 otherwise) — exact math, dropout stream moves (noise).
    """
    return _fwd(x, h, scale, bias, seed, p_drop, eps, block_rows)


def _fused_fwd(x, h, scale, bias, seed, p_drop, eps, block_rows=1):
    y = _fwd(x, h, scale, bias, seed, p_drop, eps, block_rows)
    return y, (x, h, scale, seed)


def _fused_bwd(p_drop, eps, block_rows, res, dy):
    x, h, scale, seed = res
    dx, dh, dscale_p, dbias_p = _bwd_call(
        x, h, scale, seed, p_drop, eps, dy, block_rows
    )
    dscale = jnp.sum(dscale_p, axis=(0, 1)).astype(scale.dtype)
    dbias = jnp.sum(dbias_p, axis=(0, 1)).astype(scale.dtype)
    return dx, dh, dscale, dbias, None


fused_dropout_add_ln.defvjp(_fused_fwd, _fused_bwd)
