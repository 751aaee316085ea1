"""Pallas frontend-conv experiments (HuBERT waveform stack).

MEASURED OUTCOME (keep for the record — neither variant is the prod
path): the eval trace attributes ~43 ms/step at B=64 to the conv
frontend vs a ~16 ms bf16 roofline, so two pallas attacks were built
and benchmarked end-to-end:

  frontend_impl="pallas"  (fused_frontend_conv): 367 clips/s (vs 448
    on the XLA path). The even/odd phase split is a sublane-stride-2
    shuffle that Mosaic lowers expensively, and the kernel boundary
    forces layout copies out of XLA's transposed conv layouts
    ({2,0,1:T(8,128)}).
  frontend_impl="conv_act" (pallas_activation): 373 clips/s. The convs
    stay bare-XLA, but each custom-call boundary still forces layout
    copies on GB-sized activations that cost more than the fused
    elementwise saves.

Conclusion: XLA's integrated conv+fusion+layout choices win at these
shapes; the ~27 ms roofline gap is priced into its layout strategy.
Both kernels remain available, interpret-tested, and param-compatible
for future toolchains where the layout boundary is cheaper.

Every HuBERT conv after the first is stride-2 with kernel 2 or 3
(conv_dim 512->512), so a VALID conv is exactly 2-3 contiguous
(T, 512) @ (512, 512) MXU matmuls over the even/odd phases of the
input:

    xr = x[:2*nb].reshape(nb, 2, C); xe, xo = xr[:, 0], xr[:, 1]
    k=2: y[t] = xe[t]·W0 + xo[t]·W1
    k=3: y[t] = xe[t]·W0 + xo[t]·W1 + xe[t+1]·W2

The kernel runs that per batch row with the *input* activation applied
in VMEM (``prologue``: the previous layer's GELU, or GroupNorm+GELU for
conv_1 given externally computed stats) — the activated tensor never
exists in HBM.

Alignment scheme (Mosaic requires dynamic sublane offsets provably
divisible by 8): outputs are allocated with padded rows
(align8(t_out) + margin); sub-chunks start at
min(j·tb, align8(t_out) − tb) — every start is a multiple of 8 because
tb and align8(t_out) are. The rows in [t_out, alloc) are garbage (never
written, or computed from garbage input rows) but provably never feed a
*real* downstream token: real output token t reads input rows
2t..2t+k−1 <= t_in_logical−1. Callers track logical lengths (the
``t_logical`` argument) and slice once at the end of the stack.

Backward: custom VJP that recomputes through the identical XLA
reference composition (jax.vjp) — the training path keeps XLA's conv
gradients (and normally uses the chunked-remat frontend anyway; this
kernel is the eval/bench fast path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from triad_tpu.ops.pallas_mlp import _gelu_exact

# Extra (garbage) rows appended to every output allocation so the next
# layer's aligned over-reads stay inside the buffer: the deepest read
# touches row 2·align8(t_out_next) + 1 <= 2·t_out_next + 15 <= t_out + 14.
_MARGIN = 24


def align8(n: int) -> int:
    return ((n + 7) // 8) * 8


def out_rows(t_logical: int, k: int) -> int:
    """Logical VALID stride-2 output length."""
    return (t_logical - k) // 2 + 1


def min_input_alloc(t_logical: int, k: int) -> int:
    """Rows the kernel may touch for a given logical input length."""
    t_out = out_rows(t_logical, k)
    return 2 * align8(t_out) + 2


def identity_stats(b: int, c: int):
    """Placeholder (mean, rstd, scale, bias) for the 'gelu' prologue,
    which ignores them but needs shape-compatible operands."""
    return (
        jnp.zeros((b, 1, c), jnp.float32),
        jnp.ones((b, 1, c), jnp.float32),
        jnp.ones((c,), jnp.float32),
        jnp.zeros((c,), jnp.float32),
    )


def _apply_prologue(x, prologue, mean, rstd, scale, bias):
    """x: (rows, C) in fp32. prologue: None | 'gelu' | 'norm_gelu'."""
    if prologue == "norm_gelu":
        x = (x - mean) * rstd * scale + bias
        x = _gelu_exact(x)
    elif prologue == "gelu":
        x = _gelu_exact(x)
    return x


def _kernel(
    x_ref,  # VMEM (1, T_alloc, C)
    w_ref,  # VMEM (3, C, Cout)
    mean_ref, rstd_ref, scale_ref, bias_ref,  # VMEM (1, 1, C)/(1, C)
    y_ref,  # out VMEM (1, T_out_alloc, Cout)
    *, k: int, t_al: int, tb: int, prologue: str | None,
):
    n_sub = -(-t_al // tb)  # ceil: the clamped last block overlaps back
    mean = mean_ref[0].astype(jnp.float32)
    rstd = rstd_ref[0].astype(jnp.float32)
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)
    cd = x_ref.dtype  # compute dtype follows the input (bf16 in prod)
    w0 = w_ref[0].astype(cd)
    w1 = w_ref[1].astype(cd)
    w2 = w_ref[2].astype(cd) if k == 3 else None

    def body(j, _):
        # multiples of 8 by construction (tb and t_al are); Mosaic's
        # divisibility analysis can't see through `minimum`, so assert.
        start = pl.multiple_of(jnp.minimum(j * tb, t_al - tb), 8)
        xs = x_ref[0, pl.ds(start * 2, tb * 2), :].astype(jnp.float32)
        xs = _apply_prologue(xs, prologue, mean, rstd, scale, bias)
        xs = xs.astype(cd)
        c = xs.shape[-1]
        xr = xs.reshape(tb, 2, c)
        xe, xo = xr[:, 0, :], xr[:, 1, :]
        acc = jax.lax.dot_general(
            xe, w0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc += jax.lax.dot_general(
            xo, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if k == 3:
            # third tap: even rows shifted one window — the row past the
            # main block (2·start + 2·tb, aligned) is read separately.
            xlast = x_ref[0, pl.ds(start * 2 + tb * 2, 1), :].astype(
                jnp.float32
            )
            xlast = _apply_prologue(
                xlast, prologue, mean, rstd, scale, bias
            ).astype(cd)
            xe1 = jnp.concatenate([xe[1:], xlast], axis=0)
            acc += jax.lax.dot_general(
                xe1, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        y_ref[0, pl.ds(start, tb), :] = acc.astype(y_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_sub, body, 0)


def _reference(x, w, t_logical, prologue, mean, rstd, scale, bias):
    """The identical composition in plain XLA (backward path + tests).
    Consumes the logical rows only; output is logically sized."""
    xf = x[:, :t_logical].astype(jnp.float32)
    xf = _apply_prologue(
        xf, prologue, mean, rstd,
        scale.astype(jnp.float32), bias.astype(jnp.float32),
    )
    y = jax.lax.conv_general_dilated(
        xf.astype(x.dtype), w.astype(x.dtype), window_strides=(2,),
        padding="VALID", dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype)


def _pallas_call(x, w, mean, rstd, scale, bias, t_logical, prologue, tb):
    b, t_alloc, c = x.shape
    k, _, cout = w.shape
    t_out = out_rows(t_logical, k)
    t_al = align8(t_out)
    if t_alloc < 2 * t_al + 2:
        raise ValueError(
            f"input alloc {t_alloc} rows < required {2 * t_al + 2} for "
            f"logical length {t_logical} (k={k})"
        )
    tb = min(tb, t_al)
    if tb % 8:
        raise ValueError(f"tb must be a multiple of 8 (got {tb}): the "
                         "kernel promises 8-aligned offsets to Mosaic")
    out_alloc = t_al + _MARGIN
    wp = w if k == 3 else jnp.concatenate(
        [w, jnp.zeros((3 - k,) + w.shape[1:], w.dtype)], axis=0
    )
    y = pl.pallas_call(
        functools.partial(_kernel, k=k, t_al=t_al, tb=tb, prologue=prologue),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_alloc, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((3, c, cout), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, out_alloc, cout), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, out_alloc, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(x, wp, mean, rstd, scale.reshape(1, c), bias.reshape(1, c))
    return y


def _act_kernel(
    x_ref, mean_ref, rstd_ref, scale_ref, bias_ref, y_ref, *, prologue
):
    y_ref[0] = _apply_prologue(
        x_ref[0].astype(jnp.float32),
        prologue,
        mean_ref[0].astype(jnp.float32),
        rstd_ref[0].astype(jnp.float32),
        scale_ref[0].astype(jnp.float32),
        bias_ref[0].astype(jnp.float32),
    ).astype(y_ref.dtype)


def _act_call(x, mean, rstd, scale, bias, act, tblk):
    b, t, c = x.shape
    tblk = min(tblk, t)
    nt = -(-t // tblk)
    return pl.pallas_call(
        functools.partial(_act_kernel, prologue=act),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, tblk, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tblk, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(x, mean, rstd, scale.reshape(1, c), bias.reshape(1, c))


def _act_reference(x, mean, rstd, scale, bias, act):
    y = _apply_prologue(
        x.astype(jnp.float32), act, mean, rstd,
        scale.astype(jnp.float32), bias.astype(jnp.float32),
    )
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def pallas_activation(x, mean, rstd, scale, bias, act: str, tblk: int = 512):
    """'gelu' or 'norm_gelu' as one tiled VMEM pass.

    XLA's lowering of these elementwise chains measured 2-3x the
    bandwidth roofline when fused into conv outputs (and forces the conv
    into a slower fused form); a bare pallas pass keeps the convs bare
    and the activation at one read + one write. x: (B, T, C);
    mean/rstd: (B, 1, C) stats; scale/bias: (C,) ('gelu' ignores all
    four — pass anything shape-compatible)."""
    return _act_call(x, mean, rstd, scale, bias, act, tblk)


def _act_fwd(x, mean, rstd, scale, bias, act, tblk):
    return _act_call(x, mean, rstd, scale, bias, act, tblk), (
        x, mean, rstd, scale, bias,
    )


def _act_bwd(act, tblk, res, dy):
    x, mean, rstd, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, mean, rstd, scale, bias: _act_reference(
            x, mean, rstd, scale, bias, act
        ),
        x, mean, rstd, scale, bias,
    )
    return vjp(dy)


pallas_activation.defvjp(_act_fwd, _act_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_frontend_conv(
    x, w, mean, rstd, scale, bias,
    t_logical: int, prologue: str | None, tb: int = 1024,
):
    """y = conv1d_valid_s2(prologue(x[:, :t_logical]), w), fused.

    x: (B, T_alloc, C) where T_alloc >= min_input_alloc(t_logical, k)
    (rows past t_logical are ignored garbage). w: (K, C, Cout), K in
    {2, 3}, stride fixed at 2. Returns (B, align8(t_out) + margin,
    Cout): rows past out_rows(t_logical, k) are garbage. prologue:
    None | 'gelu' | 'norm_gelu' (mean/rstd (B, 1, C) stats and
    scale/bias (C,) affine, used only by 'norm_gelu').
    """
    return _pallas_call(x, w, mean, rstd, scale, bias, t_logical, prologue, tb)


def _fwd(x, w, mean, rstd, scale, bias, t_logical, prologue, tb):
    y = _pallas_call(x, w, mean, rstd, scale, bias, t_logical, prologue, tb)
    return y, (x, w, mean, rstd, scale, bias)


def _bwd(t_logical, prologue, tb, res, dy):
    x, w, mean, rstd, scale, bias = res
    k = w.shape[0]
    t_out = out_rows(t_logical, k)
    _, vjp = jax.vjp(
        lambda x, w, mean, rstd, scale, bias: _reference(
            x, w, t_logical, prologue, mean, rstd, scale, bias
        ),
        x, w, mean, rstd, scale, bias,
    )
    return vjp(dy[:, :t_out])


fused_frontend_conv.defvjp(_fwd, _bwd)
