"""Monolithic Pallas HuBERT conv frontend: waveform -> tokens, one kernel.

Round-1 measured the XLA frontend at ~43 ms of the B=64 eval step vs a
~16 ms bf16 roofline, and two partial-pallas attacks LOST (367/373 vs
448 clips/s) because every kernel boundary forced layout copies on the
GB-sized inter-layer activations (ops/pallas_conv.py). This kernel
removes the boundaries entirely: all seven convs (kernels 10,3,3,3,3,2,2
/ strides 5,2,2,2,2,2,2), the conv_0 GroupNorm affine and every GELU run
inside ONE pallas program per (batch row, token block); HBM sees only
the waveform in (41 MB fp32 at B=64/10 s) and the (B, Na, 512) tokens
out (~33 MB bf16). Inter-layer activations live and die in VMEM.

Layout scheme (chosen to avoid Mosaic-hostile relayouts):

* the waveform arrives PRE-RESHAPED by XLA as (B, T/10, 10) — per-block
  windows are 8-aligned sublane slices of it (XLA pays one cheap 41 MB
  relayout, not a GB one).
* conv_0 (k=10, s=5) is ONE matmul per block in "G=2" form: rows
  [X10[u] | X10[u+1]] (20 wide) times a banded (20, 1024) weight yield
  [y[2u] | y[2u+1]] — conv_0 output is born PHASE-SPLIT (even|odd along
  lanes), which is exactly what the stride-2 conv_1 wants: no
  deinterleave, and the k=10 contraction widens to 20.
* every stride-2 conv (k in {2,3}) consumes a phase-split (m, 2C) block
  as ONE contraction-2C matmul against [W0; W1]; the k=3 third tap adds
  a shifted even-phase matmul (static offset-1 sublane slice + one-row
  concat — the pattern Mosaic already lowers in ops/pallas_conv.py).
  Outputs re-fold to (m/2, 2C) with a reshape.
* GroupNorm (512 groups == per-channel over time, the HF conv_0 norm)
  needs global-time stats: a small first pass computes conv_0
  sum/sumsq per channel (same G=2 matmul, grid-accumulated); the main
  kernel applies the folded affine inline.

Row bookkeeping: each block computes tb final tokens from P1 = 32*tb +
32 conv_0 output pairs; every fold halves the row count (margin 32
halves to 1 by conv_6 and always exceeds the k=3 lookahead chain, which
needs at most +15 rows at conv_1 shrinking to +1 — see _MARGIN_CHECK in
tests). Trailing rows compute on duplicated/garbage data that provably
never reaches a valid token; the caller slices num_tokens(T).

Backward: custom VJP through the identical XLA composition (training
keeps the chunked-remat XLA frontend for memory; this kernel is the
eval/bench fast path). Reference semantics: HF HubertFeatureEncoder
(reference model.py:30 via transformers), reproduced op-for-op.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from triad_tpu.ops.pallas_mlp import _gelu_exact


def _gelu_tanh_f32(x):
    """tanh-form GELU (max abs err 4.7e-4 vs exact — below bf16 ulp at
    unit scale), fp32 transient."""
    x = x.astype(jnp.float32)
    x3 = x * x * x
    return 0.5 * x * (
        1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x3))
    )


def _gelu_tanh_native(x):
    """tanh-form GELU computed at the input dtype (packed bf16 VPU ops)."""
    half = jnp.asarray(0.5, x.dtype)
    one = jnp.asarray(1.0, x.dtype)
    c0 = jnp.asarray(0.7978845608028654, x.dtype)
    c1 = jnp.asarray(0.044715, x.dtype)
    x3 = x * x * x
    return half * x * (one + jnp.tanh(c0 * (x + c1 * x3)))


def _gelu_erf_f32(x):
    # fp32 transient for the erf polynomial (Mosaic can't lower packed-
    # bf16 compares).
    return _gelu_exact(x.astype(jnp.float32))


_GELUS = {
    "erf": _gelu_erf_f32,
    "tanh": _gelu_tanh_f32,
    "tanh_native": _gelu_tanh_native,
    "id": lambda x: x,  # measurement floor only — NOT a valid frontend
}

# HuBERT-base frontend geometry (HF config defaults; reference
# model.py:30). C = 512 for every layer.
KERNELS = (10, 3, 3, 3, 3, 2, 2)
STRIDES = (5, 2, 2, 2, 2, 2, 2)
C = 512


def num_tokens(t: int) -> int:
    for k, s in zip(KERNELS, STRIDES):
        t = (t - k) // s + 1
    return t


def make_g2_weight(w0: jax.Array) -> jax.Array:
    """conv_0 weight (10, C) -> banded (20, 2C) G=2 form: row u of
    [X10[u] | X10[u+1]] (20 samples) -> [y[2u] | y[2u+1]]. y[2u] reads
    samples 10u..10u+9 (band rows 0..9); y[2u+1] reads 10u+5..10u+14
    (band rows 5..14)."""
    c = w0.shape[1]
    wg = jnp.zeros((20, 2 * c), jnp.float32)
    wg = wg.at[0:10, 0:c].set(w0.astype(jnp.float32))
    wg = wg.at[5:15, c : 2 * c].set(w0.astype(jnp.float32))
    return wg


def make_g2_weight_xt(w0: jax.Array) -> jax.Array:
    """conv_0 weight (10, C) -> (32, 2C) for the "xt" tap-plane layout:
    xc_t row r is tap plane r of pair u (r < 16) or of pair u+1
    (r >= 16). y[2u] reads planes 0..9 of pair u; y[2u+1] reads samples
    10u+5..10u+14 = planes 5..9 of pair u + planes 0..4 of pair u+1."""
    c = w0.shape[1]
    wg = jnp.zeros((32, 2 * c), jnp.float32)
    wg = wg.at[0:10, 0:c].set(w0.astype(jnp.float32))
    wg = wg.at[5:10, c : 2 * c].set(w0[0:5].astype(jnp.float32))
    wg = wg.at[16:21, c : 2 * c].set(w0[5:10].astype(jnp.float32))
    return wg


def _xt_load_len(n_pairs: int) -> int:
    """Lane length for one "xt" block load: >= n_pairs + 1 (the odd
    phase peeks one pair ahead) and 128-aligned (tpu.dynamic_rotate
    rejects unaligned shapes — same constraint as pallas_posconv)."""
    return _round_up_fe(n_pairs + 1, 128)


def _round_up_fe(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _conv0_block(x_ref, wg_ref, zero, p0, n_pairs, wave_layout):
    """conv_0 for pairs [p0, p0+n_pairs) -> (n_pairs, 2C) f32
    phase-split output, from whichever wire layout x_ref carries.

    "xt" (x_ref (1, 16, U): tap-plane sublanes, pair-index lanes) skips
    the (n, 10) row view entirely: the block loads once as (16, LL),
    the pair-(u+1) planes come from ONE lane roll (dynamic shift
    ``zero + LL - 1`` — a constant shift would stay a lazy layout
    offset and poison the concat, the pallas_posconv lesson), and
    conv_0 is a single sublane-contracting dot_general against the
    (32, 2C) banded weight. No 12.8x-padded HBM tensor, no VMEM
    relayout: the wire footprint is 16/10 of the waveform."""
    if wave_layout == "xt":
        ll = _xt_load_len(n_pairs)
        xa = x_ref[0, :, pl.ds(p0, ll)]  # (16, LL) f32
        xb = pltpu.roll(xa, zero + ll - 1, axis=1)  # lane u <- u+1
        xc_t = jnp.concatenate(
            [xa[:, :n_pairs], xb[:, :n_pairs]], axis=0
        )  # (32, n_pairs)
        return jax.lax.dot_general(
            xc_t.astype(jnp.bfloat16), wg_ref[...].astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    x10v = _load_x10(x_ref, p0, n_pairs, wave_layout)
    return _conv0_pairs(x10v, wg_ref, n_pairs)


def _conv0_pairs(x10v, wg_ref, n_pairs):
    """Phase-split conv_0 on a VALUE x10v ((>= n_pairs+1, 10) f32) for
    local pairs [0, n_pairs): (n_pairs, 2C) f32.

    Matmul runs in bf16 (the production frontend computes conv_0 at the
    model dtype — reference autocast semantics) with fp32 accumulation.
    """
    xa = x10v[:n_pairs]
    # pair u's odd output needs X10[u+1]; build the shifted copy with a
    # static offset-1 slice + the row right past the block.
    xb = jnp.concatenate([xa[1:], x10v[n_pairs : n_pairs + 1]], axis=0)
    xc = jnp.concatenate([xa, xb], axis=1)  # (n_pairs, 20)
    return jax.lax.dot_general(
        xc.astype(jnp.bfloat16), wg_ref[...].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _load_x10(x_ref, p0, n_pairs, wave_layout):
    """Read the (n_pairs+8, 10) f32 window for conv_0 pairs
    [p0, p0+n_pairs) from the waveform ref.

    "x10":  x_ref is (1, R10p, 10) — a direct 8-aligned sublane slice,
            but the 10-wide lane dim tiles to 128 in both HBM and VMEM
            (~12.8x padding on a 537 MB tensor at B=64/10 s).
    "x640": x_ref is (1, R640p, 640) — rows of 64 pairs, lanes exactly
            tiled (42 MB true footprint); the (rows, 640) block is
            re-viewed as (rows*64, 10) in VMEM (one ~84 KB relayout per
            block). Requires p0 % 64 == 0 and (p0/64) % 8 == 0.
    """
    if wave_layout == "x640":
        row0 = pl.multiple_of(p0 // 64, 8)
        nrows = (n_pairs + 8 + 63) // 64
        rows = x_ref[0, pl.ds(row0, nrows), :]  # (nrows, 640)
        return rows.reshape(nrows * 64, 10)
    return x_ref[0, pl.ds(p0, n_pairs + 8), :]


def _stride2_layer(z, w01, w2, gelu_fn=_gelu_erf_f32):
    """One stride-2 conv on a phase-split input.

    z: (m, 2C) bf16 = [x_even | x_odd] (= input rows 2u | 2u+1), with
    the layer's input activation NOT yet applied — GELU happens here
    (in bf16, like the production bf16 frontend / reference autocast)
    so it is computed exactly once, in VMEM. Output (m, C) bf16:
    y[u] = g(x[2u])W0 + g(x[2u+1])W1 (+ g(x[2u+2])W2 for k=3, where
    x[2u+2] = even phase of the next pair)."""
    m, c2 = z.shape
    c = c2 // 2
    cd = jnp.bfloat16
    z = gelu_fn(z).astype(cd)
    acc = jax.lax.dot_general(
        z, w01.astype(cd), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if w2 is not None:
        xe = z[:, :c]
        xe1 = jnp.concatenate([xe[1:], xe[-1:]], axis=0)
        acc += jax.lax.dot_general(
            xe1, w2.astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc.astype(cd)


def _fold(y):
    """(m, C) -> (m/2, 2C): row u = [y[2u] | y[2u+1]]."""
    m, c = y.shape
    return y.reshape(m // 2, 2 * c)


# ---------------------------------------------------------------------------
# Stats pass: conv_0 per-channel sum / sumsq (GroupNorm global stats)
# ---------------------------------------------------------------------------


def _stats_kernel(x_ref, wg_ref, z_ref, sum_ref, sq_ref, *, m0_total: int,
                  tb_pairs: int, wave_layout: str):
    j = pl.program_id(1)
    u0 = pl.multiple_of(j * tb_pairs, 8)
    y = _conv0_block(x_ref, wg_ref, z_ref[0, 0], u0, tb_pairs,
                     wave_layout)  # (tb_pairs, 2C)
    c = y.shape[1] // 2
    pair = u0 + jax.lax.broadcasted_iota(jnp.int32, (tb_pairs, 1), 0)
    ye = jnp.where(2 * pair < m0_total, y[:, :c], 0.0)
    yo = jnp.where(2 * pair + 1 < m0_total, y[:, c:], 0.0)

    @pl.when(j == 0)
    def _():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    # (1, 8, C) output blocks (Mosaic needs sublane-multiple block
    # shapes); the accumulator lives in row 0.
    sum_ref[0, 0, :] += jnp.sum(ye + yo, axis=0)
    sq_ref[0, 0, :] += jnp.sum(ye * ye + yo * yo, axis=0)


def _stats_gram_kernel(x_ref, z_ref, ge_ref, go_ref, s_ref,
                       *, m0_total: int, tb_pairs: int):
    """GroupNorm stats for the "xt" layout WITHOUT recomputing conv_0.

    sumsq_c = Σ_m y[m,c]² is a quadratic form in the tap planes:
    Σ (w_cᵀ x_m)² = w_cᵀ (Σ x_m x_mᵀ) w_c — so the kernel only
    accumulates the 32x32 tap Gram matrix per phase (plus the tap sum
    vectors for the mean) and the host contracts them with the banded
    weight. ~25x fewer MACs than the conv_0 recompute (n·32·32 vs
    n·20·1024) and f32 throughout (more accurate than the bf16-y
    squaring of the generic path; tested within frontend tolerance).

    Even outputs y[2u] are valid for u < n_e = ceil(m0/2), odd for
    u < n_o = floor(m0/2) — two masked Grams (they differ by at most
    the final pair).
    """
    j = pl.program_id(1)
    zero = z_ref[0, 0]
    u0 = pl.multiple_of(j * tb_pairs, 128)
    ll = _xt_load_len(tb_pairs)
    xa = x_ref[0, :, pl.ds(u0, ll)]  # (16, LL) f32
    xb = pltpu.roll(xa, zero + ll - 1, axis=1)
    xc_t = jnp.concatenate(
        [xa[:, :tb_pairs], xb[:, :tb_pairs]], axis=0
    )  # (32, n)
    u = u0 + jax.lax.broadcasted_iota(jnp.int32, (1, tb_pairs), 1)
    n_o = m0_total // 2
    n_e = m0_total - n_o
    xe = jnp.where(u < n_e, xc_t, 0.0)
    xo = jnp.where(u < n_o, xc_t, 0.0)

    @pl.when(j == 0)
    def _():
        ge_ref[...] = jnp.zeros_like(ge_ref)
        go_ref[...] = jnp.zeros_like(go_ref)
        s_ref[...] = jnp.zeros_like(s_ref)

    gram = lambda x: jax.lax.dot_general(
        x, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ge_ref[0] += gram(xe)
    go_ref[0] += gram(xo)
    s_ref[0, 0, :] += jnp.sum(xe, axis=1)
    s_ref[0, 1, :] += jnp.sum(xo, axis=1)


def stats_block(n_pairs: int, tb_pairs: int = 2048,
                wave_layout: str = "x10") -> int:
    """Stats-pass block size: clamped to the pair count, 8-aligned
    ("x10"), 64-aligned ("x640": blocks start on 640-sample rows) or
    128-aligned ("xt": lane-slice starts must be 128-aligned)."""
    align = {"x640": 64, "xt": 128}.get(wave_layout, 8)
    return min(tb_pairs, ((n_pairs + align - 1) // align) * align)


def conv0_stats(
    x10: jax.Array, wg: jax.Array, m0_total: int, tb_pairs: int = 2048,
    interpret: bool = False, wave_layout: str = "x10",
) -> Tuple[jax.Array, jax.Array]:
    """(B, R10p, 10) (or (B, R640p, 640)) padded waveform rows ->
    (mean, var) each (B, C) over conv_0's m0_total logical output rows."""
    b, r10, _ = x10.shape
    n_pairs = (m0_total + 1) // 2
    tb_pairs = stats_block(n_pairs, tb_pairs, wave_layout)
    nb = -(-n_pairs // tb_pairs)
    if wave_layout == "x640":
        need_rows = (nb - 1) * (tb_pairs // 64) + (tb_pairs + 8 + 63) // 64
        if nb > 1 and tb_pairs % 512:
            raise ValueError(
                f"x640 stats blocks must start on 8-row boundaries: "
                f"tb_pairs {tb_pairs} (use a multiple of 512 or one block)"
            )
    elif wave_layout == "xt":
        # x10 is (B, 16, U): need lanes for the last block's load.
        need_rows = (nb - 1) * tb_pairs + _xt_load_len(tb_pairs)
        r10 = x10.shape[2]
    else:
        need_rows = nb * tb_pairs + 8
    if need_rows > r10:
        raise ValueError(
            f"waveform rows {r10} < stats requirement {need_rows}"
        )
    if wave_layout == "xt":
        ge, go, sv = pl.pallas_call(
            functools.partial(
                _stats_gram_kernel, m0_total=m0_total, tb_pairs=tb_pairs
            ),
            grid=(b, nb),
            in_specs=[
                pl.BlockSpec((1,) + x10.shape[1:], lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 32, 32), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, 32, 32), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, 8, 32), lambda i, j: (i, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, 32, 32), jnp.float32),
                jax.ShapeDtypeStruct((b, 32, 32), jnp.float32),
                jax.ShapeDtypeStruct((b, 8, 32), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(x10, jnp.zeros((1, 1), jnp.int32))
        w_e = wg[:, :C]  # (32, C) f32
        w_o = wg[:, C:]
        # HIGHEST precision is load-bearing, not hygiene: these host
        # contractions run at the platform DEFAULT matmul precision
        # otherwise, which TPU downcasts to bf16 — and the quadratic
        # form's ~0.4% relative error is enough to drive a genuinely
        # small channel variance (measured true var ~1.3e-3 on
        # uniform-noise audio) NEGATIVE (measured -1.17e-3), making
        # rsqrt(var + 1e-5) NaN for the whole row. The r4/r5 perf-kernel
        # forward NaN (2/64 culprit-batch rows) was exactly this;
        # scripts/tpu_nan_fe_xt_probe.py is the on-chip regression. The
        # contraction is (B,32,32)x(32,C)^2 — microseconds either way.
        hi = jax.lax.Precision.HIGHEST
        sum_c = jnp.einsum("bi,ic->bc", sv[:, 0, :], w_e, precision=hi)
        sum_c += jnp.einsum("bi,ic->bc", sv[:, 1, :], w_o, precision=hi)
        sq_c = jnp.einsum(
            "bij,jc,ic->bc", ge, w_e, w_e, precision=hi
        ) + jnp.einsum("bij,jc,ic->bc", go, w_o, w_o, precision=hi)
        mean = sum_c / m0_total
        # Clamp: E[x^2] - E[x]^2 can still round epsilon-negative at
        # f32 for near-zero true variance; rsqrt must never see < -eps.
        var = jnp.maximum(sq_c / m0_total - mean * mean, 0.0)
        return mean, var
    s, sq = pl.pallas_call(
        functools.partial(
            _stats_kernel, m0_total=m0_total, tb_pairs=tb_pairs,
            wave_layout=wave_layout,
        ),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(
                (1,) + x10.shape[1:], lambda i, j: (i, 0, 0)
            ),
            pl.BlockSpec(wg.shape, lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, C), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, C), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, C), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x10, wg, jnp.zeros((1, 1), jnp.int32))
    s = s[:, 0, :]
    sq = sq[:, 0, :]
    mean = s / m0_total
    # Same epsilon-negative clamp as the xt branch above.
    var = jnp.maximum(sq / m0_total - mean * mean, 0.0)
    return mean, var


# ---------------------------------------------------------------------------
# Main pass
# ---------------------------------------------------------------------------


def _main_kernel(
    x_ref,  # (1, R10p, 10) fp32 ("x10") / (1, R640p, 640) ("x640")
    #         / (1, 16, U) tap-plane ("xt")
    wg_ref,  # (20, 2C), or (32, 2C) for "xt"
    wcat_ref,  # (6, 2C, C) [W0;W1] for conv_1..conv_6
    w2_ref,  # (4, C, C) third taps, conv_1..conv_4
    affine_ref,  # (1, 2, 2C) folded GroupNorm scale' | bias'
    z_ref,  # SMEM (1, 1) int32, always 0 ("xt" dynamic roll shift)
    y_ref,  # out (1, tb, C)
    *, tb: int, p1: int, gelu: str = "erf", wave_layout: str = "x10",
):
    gelu_fn = _GELUS[gelu]
    j = pl.program_id(1)
    # "xt" lane slices must be provably 128-aligned on real TPU (Mosaic
    # rejects the vector.load otherwise); tb*32 % 128 == 0 is enforced
    # at trace time, so the stronger hint is always sound there.
    p0 = pl.multiple_of(j * (tb * 32), 128 if wave_layout == "xt" else 8)
    y0 = _conv0_block(x_ref, wg_ref, z_ref[0, 0], p0, p1,
                      wave_layout)  # (P1, 2C) phase-split
    z = (
        y0 * affine_ref[0, 0][None, :] + affine_ref[0, 1][None, :]
    ).astype(jnp.bfloat16)
    for li in range(6):
        w01 = wcat_ref[li]
        w2 = w2_ref[li] if KERNELS[1 + li] == 3 else None
        y = _stride2_layer(z, w01, w2, gelu_fn)
        if li < 5:
            z = _fold(y)
    y_ref[0, :, :] = gelu_fn(y[:tb]).astype(y_ref.dtype)


def monolithic_frontend(
    wave: jax.Array,
    w0: jax.Array,
    gn_scale: jax.Array,
    gn_bias: jax.Array,
    ws: Sequence[jax.Array],
    tb: int = 64,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    gelu: str = "erf",
    wave_layout: str = "x10",
) -> jax.Array:
    """wave (B, T) -> tokens (B, num_tokens(T), C) in out_dtype.

    w0: conv_0 weight (10, 1, C) or (10, C); gn_scale/gn_bias (C,);
    ws: conv_1..conv_6 weights, each (k, C, C). tb: final tokens per
    block, multiple of 8. gelu: activation impl from _GELUS ("erf"
    exact; "tanh"/"tanh_native" 4.7e-4-max-err fast forms; "id" for
    floor measurement only). wave_layout: "x10" ships the waveform as
    (B, T/10, 10) — simple slicing but the 10-wide lane dim tiles to
    128 (~12.8x padded HBM footprint and a measured 1.35 ms/step XLA
    pad+relayout at B=64/10 s); "x640" ships (B, T/640, 640) — lanes
    exactly tiled, the (rows, 640) -> (rows*64, 10) re-view happens on
    an ~84 KB VMEM block inside the kernel (needs tb % 16 == 0).
    """
    if tb % 8:
        raise ValueError(f"tb must be a multiple of 8, got {tb}")
    if wave_layout not in ("x10", "x640", "xt"):
        raise ValueError(f"unknown wave_layout {wave_layout!r}")
    if wave_layout == "x640" and tb % 16:
        raise ValueError(f"x640 layout needs tb % 16 == 0, got {tb}")
    if wave_layout == "xt" and (tb * 32) % 128:
        raise ValueError(f"xt layout needs tb % 4 == 0, got {tb}")
    b, t = wave.shape
    t -= t % 10
    wave = wave[:, :t]
    n_out = num_tokens(t)
    m0_total = (t - 10) // 5 + 1
    if wave_layout == "xt":
        wg = make_g2_weight_xt(w0.reshape(10, -1))
    else:
        wg = make_g2_weight(w0.reshape(10, -1))
    p1 = 32 * tb + 32  # conv_0 pairs per block (margin 32, see header)
    nb = -(-n_out // tb)

    # Pad waveform rows so every block's window (incl. the +1 tail row
    # and the stats pass) reads in-bounds; padded zeros only feed tokens
    # >= n_out, which the final slice drops.
    n_pairs = (m0_total + 1) // 2
    stb = stats_block(n_pairs, wave_layout=wave_layout)
    nbs = -(-n_pairs // stb)
    if wave_layout == "x640":
        main_rows = (nb - 1) * (tb // 2) + (p1 + 8 + 63) // 64
        stats_rows = (nbs - 1) * (stb // 64) + (stb + 8 + 63) // 64
        r_pad = max(main_rows, stats_rows, -(-t // 640))
        x10 = jnp.pad(
            wave.astype(jnp.float32), ((0, 0), (0, r_pad * 640 - t))
        ).reshape(b, r_pad, 640)
    elif wave_layout == "xt":
        # Tap-plane layout (B, 16, U): sublane r < 10 holds sample
        # 10u + r of pair u at lane u. True footprint 16/10 of the
        # waveform (vs the 12.8x lane-padded x10 tensor) and the XLA
        # prep is one fused pad+reshape+transpose copy.
        main_lanes = (nb - 1) * (tb * 32) + _xt_load_len(p1)
        stats_lanes = (nbs - 1) * stb + _xt_load_len(stb)
        u_pad = _round_up_fe(max(main_lanes, stats_lanes, t // 10), 128)
        x10 = jnp.pad(
            wave.astype(jnp.float32), ((0, 0), (0, u_pad * 10 - t))
        ).reshape(b, u_pad, 10)
        x10 = jnp.pad(
            jnp.transpose(x10, (0, 2, 1)), ((0, 0), (0, 6), (0, 0))
        )  # (B, 16, U)
    else:
        r10 = t // 10
        stats_rows = nbs * stb + 8
        r_pad = max(32 * tb * (nb - 1) + p1 + 8, stats_rows, r10 + 8)
        x10 = jnp.pad(
            wave.astype(jnp.float32), ((0, 0), (0, r_pad * 10 - t))
        ).reshape(b, r_pad, 10)

    mean, var = conv0_stats(x10, wg, m0_total, interpret=interpret,
                            wave_layout=wave_layout)
    rstd = jax.lax.rsqrt(var + 1e-5)
    scale = rstd * gn_scale[None, :].astype(jnp.float32)
    bias = gn_bias[None, :].astype(jnp.float32) - mean * scale
    affine = jnp.stack(
        [jnp.concatenate([scale, scale], 1),
         jnp.concatenate([bias, bias], 1)], axis=1,
    )  # (B, 2, 2C)

    wcat = jnp.stack(
        [jnp.concatenate([w[0], w[1]], axis=0).astype(jnp.float32)
         for w in ws]
    )  # (6, 2C, C)
    w2 = jnp.stack(
        [ws[i][2].astype(jnp.float32) for i in range(4)]
    )  # (4, C, C)

    y = pl.pallas_call(
        functools.partial(_main_kernel, tb=tb, p1=p1, gelu=gelu,
                          wave_layout=wave_layout),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1,) + x10.shape[1:], lambda i, j: (i, 0, 0)),
            pl.BlockSpec(wg.shape, lambda i, j: (0, 0)),
            pl.BlockSpec((6, 2 * C, C), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((4, C, C), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 2, 2 * C), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, C), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nb * tb, C), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x10, wg, wcat, w2, affine, jnp.zeros((1, 1), jnp.int32))
    return y[:, :n_out]


def reference_frontend(wave, w0, gn_scale, gn_bias, ws,
                       out_dtype=jnp.bfloat16, gelu: str = "erf",
                       compute_dtype=None):
    """The identical composition in plain XLA (tests + custom-VJP
    backward). Matches HF HubertFeatureEncoder: conv_0 -> GroupNorm ->
    GELU -> (conv -> GELU) x6.

    compute_dtype controls the conv-operand dtype (default fp32). Both
    conv operands share it so jax.vjp stays transposable (mixed
    bf16/fp32 conv transposes reject dtype mismatches). bf16 is what
    the production chunked-remat path computes in (ConvFeatureEncoder
    dtype=bf16), and what _mf_bwd recomputes in: the round-2 train
    trace showed the fp32 recompute backward holding ~85 ms/step of
    f32[64,31999,512]-class dgrad/wgrad fusions at B=64 — bf16 halves
    the traffic and quadruples the MXU rate. GroupNorm stats and GELU
    transients stay fp32 (fused converts, no materialization)."""
    cd = jnp.float32 if compute_dtype is None else compute_dtype
    gelu_fn = _GELUS[gelu]
    x = wave.astype(cd)[:, :, None]
    w0r = w0.reshape(10, 1, -1).astype(cd)
    y = jax.lax.conv_general_dilated(
        x, w0r, window_strides=(5,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=1, keepdims=True)
    var = jnp.var(yf, axis=1, keepdims=True)
    y = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
    y = (y * gn_scale[None, None, :] + gn_bias[None, None, :]).astype(cd)
    for w in ws:
        y = gelu_fn(y).astype(cd)
        y = jax.lax.conv_general_dilated(
            y, w.astype(cd), window_strides=(2,),
            padding="VALID", dimension_numbers=("NHC", "HIO", "NHC"),
        )
    return gelu_fn(y).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def monolithic_frontend_vjp(wave, w0, gn_scale, gn_bias, ws,
                            tb: int = 64, out_dtype=jnp.bfloat16,
                            gelu: str = "erf", wave_layout: str = "x10"):
    """monolithic_frontend with an XLA-recompute backward (the training
    path normally uses the chunked-remat XLA frontend; this VJP exists
    so the kernel is safe under jax.grad)."""
    return monolithic_frontend(wave, w0, gn_scale, gn_bias, ws, tb,
                               out_dtype, gelu=gelu,
                               wave_layout=wave_layout)


def _mf_fwd(wave, w0, gn_scale, gn_bias, ws, tb, out_dtype, gelu,
            wave_layout):
    y = monolithic_frontend(wave, w0, gn_scale, gn_bias, ws, tb, out_dtype,
                            gelu=gelu, wave_layout=wave_layout)
    return y, (wave, w0, gn_scale, gn_bias, tuple(ws))


def _mf_bwd(tb, out_dtype, gelu, wave_layout, res, dy):
    wave, w0, gn_scale, gn_bias, ws = res
    # Recompute in the model dtype (bf16 in production, == the chunked
    # parity path's conv numerics; fp32 when out_dtype is fp32, e.g.
    # the grad tests). Cotangents come back fp32 via the cast
    # transposes (fp32 primals).
    _, vjp = jax.vjp(
        lambda wave, w0, s, b, ws: reference_frontend(
            wave, w0, s, b, ws, out_dtype, gelu=gelu,
            compute_dtype=out_dtype,
        ),
        wave, w0, gn_scale, gn_bias, list(ws),
    )
    return vjp(dy)


monolithic_frontend_vjp.defvjp(_mf_fwd, _mf_bwd)
