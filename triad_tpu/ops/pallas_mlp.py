"""Fused Pallas TPU transformer MLP with in-kernel activation dropout.

fc1 -> exact GELU -> dropout -> fc2 in one VMEM-resident pass. The
training-step profile attributes ~69 ms/step (B=64, 10 s audio) to
HuBERT's activation dropout alone (an HBM-materialized (B, T, 3072)
mask + its backward), on top of the (B, T, 3072) hidden-activation
traffic; the reference trains with HF's activation_dropout=0.1 active.

  forward : per batch element (grid step): h = x·W1 + b1 (fp32 accum),
            g = gelu(h) (exact, erf), dropout from the per-core PRNG,
            y = g·W2 + b2. The (T, 3072) hidden tile never leaves VMEM.
  backward: custom VJP. The kernel recomputes h/g and replays the SAME
            dropout bits (same seed, same order), then emits
              dx = (dg ∘ gelu'(h)) · W1ᵀ,
              dh (for the weight grads) and g (the dropped GELU output),
            and the wrapper forms dW1 = xᵀ·dh, db1 = Σdh, dW2 = gᵀ·dy,
            db2 = Σdy as plain XLA matmuls — weight grads want cross-
            batch reduction, which XLA already does at roofline.

Dropout semantics match nn.Dropout (Bernoulli keep, 1/(1-p) scale);
the bits come from the TPU core PRNG (different stream, same
distribution — dropout is noise, not a checkpointable contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from triad_tpu.ops.pallas_attention import _keep_mask

_SQRT_HALF = float(1.0 / np.sqrt(2.0))
_INV_SQRT_2PI = float(1.0 / np.sqrt(2.0 * np.pi))


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation (max abs error
    1.5e-7 — below fp32 training noise). lax.erf has no Mosaic lowering,
    so the kernel carries its own."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, pp = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + pp * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(h):
    return h * 0.5 * (1.0 + _erf(h * _SQRT_HALF))


def _gelu_grad(h):
    cdf = 0.5 * (1.0 + _erf(h * _SQRT_HALF))
    pdf = jnp.exp(-0.5 * h * h) * _INV_SQRT_2PI
    return cdf + h * pdf


# tanh-form GELU (max abs err 4.7e-4 vs exact erf — below bf16 rounding
# at unit scale). The erf rational needs exp + divide on the VPU; tanh
# lowers to one cheaper transcendental. In the monolithic conv frontend
# this exact swap took the kernel 44.7 -> 28.5 ms (docs/TRAINING_PERF.md
# round 2); the MLP kernels evaluate ~1.2B GELUs/step at B=64 HuBERT
# shapes, so they get the same opt-in (config mlp_gelu="tanh").
_TANH_C0 = 0.7978845608028654  # sqrt(2/pi)
_TANH_C1 = 0.044715


def _gelu_tanh(h):
    return 0.5 * h * (1.0 + jnp.tanh(_TANH_C0 * (h + _TANH_C1 * h * h * h)))


def _gelu_tanh_grad(h):
    t = jnp.tanh(_TANH_C0 * (h + _TANH_C1 * h * h * h))
    du = _TANH_C0 * (1.0 + 3.0 * _TANH_C1 * h * h)
    return 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * du


_GELU = {"erf": _gelu_exact, "tanh": _gelu_tanh}
_GELU_GRAD = {"erf": _gelu_grad, "tanh": _gelu_tanh_grad}


def _fwd_kernel(
    seed_ref,  # SMEM (1, 1) int32
    x_ref,  # VMEM (1, T, Din)
    w1_ref, b1_ref, w2_ref, b2_ref,
    y_ref,  # out VMEM (1, T, Dout)
    *, p_drop: float, gelu: str,
):
    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    h = jax.lax.dot_general(
        x_ref[0], w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)[None, :]
    g = _GELU[gelu](h)
    if p_drop > 0.0:
        keep = _keep_mask(g.shape, p_drop)
        g = jnp.where(keep, g * (1.0 / (1.0 - p_drop)), 0.0)
    y = jax.lax.dot_general(
        g.astype(w2_ref.dtype), w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)[None, :]
    y_ref[0] = y.astype(y_ref.dtype)


def _bwd_kernel(
    seed_ref,
    x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
    dx_ref,  # out (1, T, Din)
    dh_ref,  # out (1, T, Dh)   — feeds dW1 = xᵀ·dh outside
    g_ref,  # out (1, T, Dh)    — dropped gelu output, feeds dW2 = gᵀ·dy
    *, p_drop: float, gelu: str,
):
    if p_drop > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    h = jax.lax.dot_general(
        x_ref[0], w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)[None, :]
    g = _GELU[gelu](h)
    dy = dy_ref[0].astype(jnp.float32)
    dg = jax.lax.dot_general(  # dy · W2ᵀ
        dy, w2_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if p_drop > 0.0:
        keep = _keep_mask(g.shape, p_drop)
        inv = 1.0 / (1.0 - p_drop)
        g = jnp.where(keep, g * inv, 0.0)
        dg = jnp.where(keep, dg * inv, 0.0)
    dh = dg * _GELU_GRAD[gelu](h)
    dx_ref[0] = jax.lax.dot_general(
        dh.astype(w1_ref.dtype), w1_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)
    dh_ref[0] = dh.astype(dh_ref.dtype)
    g_ref[0] = g.astype(g_ref.dtype)


def _full(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd)


def _merge_rows(block_rows: int, *arrays):
    """View (B, T, D) arrays as (B/rb, rb*T, D) — free in HBM (row-major
    contiguous) — so each grid step feeds the MXU an rb*T-row matmul
    instead of T. The MLP math is row-independent, so numerics are
    bit-identical; only the dropout stream (seed + program_id) moves,
    which the kernel's contract declares non-checkpointable noise.
    Forward and backward MUST use the same block_rows or the backward's
    dropout replay would diverge from the forward's bits."""
    b = arrays[0].shape[0]
    if block_rows <= 1 or b % block_rows:
        return arrays, b
    return (
        tuple(a.reshape(b // block_rows, block_rows * a.shape[1], a.shape[2])
              for a in arrays),
        b,
    )


def _fwd(x, w1, b1, w2, b2, seed, p_drop, gelu, block_rows=1):
    (x,), b_orig = _merge_rows(block_rows, x)
    b, t, din = x.shape
    dh, dout = w1.shape[1], w2.shape[1]
    seed2d = seed.astype(jnp.int32).reshape(1, 1)
    row = lambda d: pl.BlockSpec((1, t, d), lambda i: (i, 0, 0))
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, p_drop=p_drop, gelu=gelu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            row(din),
            _full(w1.shape), _full((1, dh)), _full(w2.shape), _full((1, dout)),
        ],
        out_specs=row(dout),
        out_shape=jax.ShapeDtypeStruct((b, t, dout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed2d, x, w1, b1.reshape(1, dh), w2, b2.reshape(1, dout))
    return y.reshape(b_orig, -1, dout)


def _bwd_call(x, w1, b1, w2, seed, p_drop, gelu, dy, block_rows=1):
    (x, dy), b_orig = _merge_rows(block_rows, x, dy)
    b, t, din = x.shape
    dh_dim = w1.shape[1]
    dout = w2.shape[1]
    seed2d = seed.astype(jnp.int32).reshape(1, 1)
    row = lambda d: pl.BlockSpec((1, t, d), lambda i: (i, 0, 0))
    dx, dh, g = pl.pallas_call(
        functools.partial(_bwd_kernel, p_drop=p_drop, gelu=gelu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            row(din),
            _full(w1.shape), _full((1, dh_dim)), _full(w2.shape),
            row(dout),
        ],
        out_specs=[row(din), row(dh_dim), row(dh_dim)],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, din), x.dtype),
            jax.ShapeDtypeStruct((b, t, dh_dim), x.dtype),
            jax.ShapeDtypeStruct((b, t, dh_dim), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed2d, x, w1, b1.reshape(1, dh_dim), w2, dy)
    t_orig = x.shape[1] * x.shape[0] // b_orig
    return (
        dx.reshape(b_orig, t_orig, din),
        dh.reshape(b_orig, t_orig, dh_dim),
        g.reshape(b_orig, t_orig, dh_dim),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_mlp(x, w1, b1, w2, b2, seed, p_drop: float, gelu: str = "erf",
              block_rows: int = 1):
    """y = dropout(gelu(x·W1 + b1))·W2 + b2, fused per batch element.

    x: (B, T, Din); w1: (Din, Dh); w2: (Dh, Dout); seed: int32 scalar
    (ignored at p_drop == 0). Weights should already be in compute
    dtype (the caller casts the fp32 masters once). gelu: "erf" (HF
    parity) or "tanh" (cheaper VPU transcendental, <=4.7e-4 abs err).
    block_rows: batch rows merged per grid step (must divide B; silently
    1 otherwise) — raises the per-step matmul M from T to rb*T and cuts
    grid steps rb-fold (fewer pipeline bubbles). Numerics are identical
    (row-independent math); only the dropout bit stream moves, which is
    declared noise. VMEM grows ~rb-fold on the (rb*T, Dh) hidden tile:
    at HuBERT bf16 train shapes rb=2 fits; the f32 backward at rb=2
    exceeds the 100 MB VMEM limit at T=499 (107.9M measured on-chip).
    RETIRED from production by measurement (r3c): the MLP kernels run
    at ~96% of bf16 peak already, and merging LOST throughput at both
    eval (rb=4: 563.0 vs 608.3 clips/s) and train (rb=2: 496.1 vs
    459.8 ms) — the bigger VMEM footprint shrinks double-buffering
    depth with no bubble to recover. Kept as an A/B knob.
    """
    return _fwd(x, w1, b1, w2, b2, seed, p_drop, gelu, block_rows)


def _fused_mlp_fwd(x, w1, b1, w2, b2, seed, p_drop, gelu="erf",
                   block_rows=1):
    y = _fwd(x, w1, b1, w2, b2, seed, p_drop, gelu, block_rows)
    return y, (x, w1, b1, w2, seed)


def _fused_mlp_bwd(p_drop, gelu, block_rows, res, dy):
    x, w1, b1, w2, seed = res
    dx, dh, g = _bwd_call(x, w1, b1, w2, seed, p_drop, gelu, dy, block_rows)
    f32 = jnp.float32
    # Cross-batch weight reductions as plain XLA matmuls (roofline).
    dw1 = jnp.einsum(
        "btd,bth->dh", x.astype(f32), dh.astype(f32),
        preferred_element_type=f32,
    ).astype(w1.dtype)
    db1 = jnp.sum(dh.astype(f32), axis=(0, 1)).astype(b1.dtype)
    dw2 = jnp.einsum(
        "bth,btd->hd", g.astype(f32), dy.astype(f32),
        preferred_element_type=f32,
    ).astype(w2.dtype)
    db2 = jnp.sum(dy.astype(f32), axis=(0, 1))
    return dx, dw1, db1, dw2, db2.astype(w2.dtype), None


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
