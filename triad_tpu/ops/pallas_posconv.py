"""Fused Pallas TPU kernel for the HuBERT positional grouped conv.

The pos-conv (reference: HF ``HubertPositionalConvEmbedding`` inside
``HubertModel``, consumed at model.py:30; rebuilt as
``models/hubert.PositionalConvEmbedding``) is a kernel-128, 16-group
conv1d over (B, N=499, C=768) with SAME padding, an even-kernel
trailing trim, and exact GELU. XLA lowers it as a feature-grouped
convolution in a transposed {0,3,2,1} layout — the round-2 train trace
showed ~6.9 ms/step of pad/relayout fusions around it plus an 8.3 ms
dW reduction at B=64 (docs/TRAINING_PERF.md), against a ~1.5 ms/pass
matmul roofline.

This kernel keeps the packed (B, N, C) layout on both sides (no XLA
relayouts) and runs one program per batch row:

  * the (Tbuf, C) block transposes once in VMEM; per group g the
    (CPG, Tbuf) slice is contracted in k-chunks of 8: an (8*CPG, Tpad)
    window stack (static lane-offset slices) against the (CPG, 8*CPG)
    weight chunk — contraction depth 384, output lanes Tpad: full MXU
    tiles, no 48-wide N padding.
  * dW reuses the same window stack in the natural orientation
    (sublane-offset slices, no transpose) against the transposed
    cotangent: (CPG, Tpad) x (Tpad, 8*CPG) per chunk, accumulated in a
    VMEM-resident (G, CPG, K*CPG) f32 output across the batch grid.
  * dX is the same forward kernel with the kernel-flipped, co/ci-
    swapped weight tensor (a correlation is a convolution with the
    flipped kernel) — zero bias, identity activation.

The custom VJP saves the pre-activation z (the GELU derivative needs
it; one bf16 tensor instead of a second conv recompute) and assembles
dz/db on the XLA side where they fuse for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from triad_tpu.ops.pallas_frontend import _GELUS

_KC = 8  # k positions per contraction chunk (8 * CPG = 384 deep)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _npad_for(n: int, k: int) -> int:
    """Padded output length such that the kernel's lane buffer
    Tbuf = npad + K is a multiple of 128: Mosaic's tpu.dynamic_rotate
    (which _lane_roll lowers to) rejects unaligned lane counts
    ("unsupported unaligned shape" on vector<48x632xf32>, real chip,
    round 3). The extra zero columns ride along and are sliced off."""
    return _round_up(n + k, 128) - k


def _lane_roll(x, shift: int, zero):
    """Materialized pltpu.roll along lanes (axis 1 of a 2-D value) for
    f32 AND 16-bit dtypes.

    Two real-hardware Mosaic constraints shape this (both hit on the
    chip, round 3; interpret mode accepts everything):
      * a CONSTANT-shift rotate is folded into a lazy layout offset,
        and tpu.concatenate then rejects operands whose offsets differ
        ("expected same layout/offset mismatch") — so the shift is made
        runtime-dynamic (``zero`` is a traced int32 scalar that is
        always 0) to force an actual data rotate to offset 0;
      * rotates are 32-bit-only ("not implemented: Rotate with
        non-32-bit data") — 16-bit inputs ride an int32 bitcast view:
        each int32 lane element packs two SUBLANE-adjacent 16-bit
        elements at the same lane position, so a lane roll of the
        packed view IS a lane roll of the original (verified against
        jnp.roll in interpret mode)."""
    if x.dtype.itemsize == 4:
        return pltpu.roll(x, zero + shift, axis=1)
    assert x.dtype.itemsize == 2 and x.shape[0] % 2 == 0, (x.dtype, x.shape)
    x32 = pltpu.bitcast(x, jnp.int32)  # (S/2, L)
    return pltpu.bitcast(pltpu.roll(x32, zero + shift, axis=1), x.dtype)


def _pc_kernel(
    x_ref,  # VMEM (1, Tbuf, C) input (zero-padded windows)
    w_ref,  # VMEM (G, CPG, K*CPG): w_t[g, co, k*CPG+ci]
    b_ref,  # VMEM (C, 1) f32 bias column
    z_ref,  # SMEM (1, 1) int32, always 0 (_lane_roll dynamic shift)
    o_ref,  # out VMEM (1, Tpad, C)
    *, g: int, cpg: int, kk: int, tpad: int, act: str,
):
    act_fn = _GELUS[act]
    zero = z_ref[0, 0]
    x_t = jnp.transpose(x_ref[0])  # (C, Tbuf)
    for gi in range(g):
        xg = x_t[gi * cpg : (gi + 1) * cpg]  # (CPG, Tbuf)
        acc = jnp.zeros((cpg, tpad), jnp.float32)
        for kc in range(kk // _KC):
            # Mosaic rejects concatenating lane slices whose lane
            # offsets differ ("result/input offset mismatch on
            # non-concat dimension" — hit on the real chip, round 3);
            # _lane_roll re-canonicalizes each shifted window to
            # offset 0 first. The wrap-around rows land past tpad
            # (shift <= kk) and are sliced off.
            parts = [
                _lane_roll(
                    xg, (xg.shape[1] - (kc * _KC + j)) % xg.shape[1], zero
                )[:, :tpad]
                for j in range(_KC)
            ]
            xstack = jnp.concatenate(parts, axis=0)  # (KC*CPG, Tpad)
            wchunk = w_ref[gi, :, kc * _KC * cpg : (kc + 1) * _KC * cpg]
            acc = acc + jax.lax.dot_general(
                wchunk, xstack,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc = acc + b_ref[gi * cpg : (gi + 1) * cpg]
        o_ref[0, :, gi * cpg : (gi + 1) * cpg] = jnp.transpose(
            act_fn(acc)
        ).astype(o_ref.dtype)


def _dw_kernel(
    x_ref,  # VMEM (1, Tbuf, C)
    dz_ref,  # VMEM (1, Tpad, C)
    z_ref,  # SMEM (1, 1) int32, always 0 (_lane_roll dynamic shift)
    dw_ref,  # out VMEM (G, CPG, K*CPG) f32, accumulated over the grid
    *, g: int, cpg: int, kk: int, tpad: int,
):
    bi = pl.program_id(0)
    zero = z_ref[0, 0]

    @pl.when(bi == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    x_t = jnp.transpose(x_ref[0])  # (C, Tbuf)
    dz_t = jnp.transpose(dz_ref[0])  # (C, Tpad)
    for gi in range(g):
        dg = dz_t[gi * cpg : (gi + 1) * cpg]  # (CPG co, Tpad)
        xg = x_t[gi * cpg : (gi + 1) * cpg]  # (CPG ci, Tbuf)
        for kc in range(kk // _KC):
            # Shifted windows as LANE rolls (like the forward): Mosaic's
            # rotate is lane-roll-friendly and the 16-bit case rides the
            # int32 bitcast in _lane_roll (sublane rolls of 16-bit data
            # have no such packing trick).
            parts = [
                _lane_roll(
                    xg, (xg.shape[1] - (kc * _KC + j)) % xg.shape[1], zero
                )[:, :tpad]
                for j in range(_KC)
            ]
            xstack = jnp.concatenate(parts, axis=0)  # (KC*CPG, Tpad)
            dw_ref[gi, :, kc * _KC * cpg : (kc + 1) * _KC * cpg] += (
                jax.lax.dot_general(
                    dg, xstack.astype(dg.dtype),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )


def _run_conv(xbuf, w_t, bias_col, act, out_dtype, interpret):
    b, tbuf, c = xbuf.shape
    g, cpg, kcpg = w_t.shape
    kk = kcpg // cpg
    tpad = tbuf - kk
    return pl.pallas_call(
        functools.partial(
            _pc_kernel, g=g, cpg=cpg, kk=kk, tpad=tpad, act=act
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tbuf, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, cpg, kcpg), lambda i: (0, 0, 0)),
            pl.BlockSpec((c, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tpad, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tpad, c), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xbuf, w_t, bias_col, jnp.zeros((1, 1), jnp.int32))


def _prep_w(w, g):
    """(K, CPG, C) flax grouped-conv kernel -> (G, CPG_out, K*CPG_in):
    w_t[g, co, k*CPG+ci] = w[k, ci, g*CPG+co]."""
    k, cpg, c = w.shape
    return (
        w.reshape(k, cpg, g, cpg)
        .transpose(2, 3, 0, 1)
        .reshape(g, cpg, k * cpg)
    )


def _unprep_dw(dw_t, k):
    """Inverse of _prep_w for the weight cotangent."""
    g, cpg, _ = dw_t.shape
    return (
        dw_t.reshape(g, cpg, k, cpg)
        .transpose(2, 3, 0, 1)
        .reshape(k, cpg, g * cpg)
    )


def _prep_w_flip(w, g):
    """dX weights: a correlation with the flipped kernel and co/ci
    swapped — wf[g, ci, k'*CPG+co] = w[K-1-k', ci, g*CPG+co]."""
    k, cpg, c = w.shape
    return (
        w[::-1]
        .reshape(k, cpg, g, cpg)
        .transpose(2, 1, 0, 3)
        .reshape(g, cpg, k * cpg)
    )


def _pad_fwd(x, k, npad):
    """Zero-pad so output t reads xpad[t .. t+K): SAME padding with the
    even-kernel trailing trim (PositionalConvEmbedding semantics)."""
    b, n, c = x.shape
    left = k // 2
    right = npad - n + k - left
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)))


def _pos_conv_impl(x, w, b, groups, interpret, act):
    bsz, n, c = x.shape
    k, cpg, cw = w.shape
    if cw != c or cpg * groups != c:
        raise ValueError(
            f"weight {w.shape} incompatible with C={c}, groups={groups}"
        )
    if k % _KC or cpg % 8:
        raise ValueError(f"need K % {_KC} == 0 and CPG % 8 == 0")
    npad = _npad_for(n, k)
    xbuf = _pad_fwd(x, k, npad)
    w_t = _prep_w(w, groups).astype(x.dtype)
    bias = b.astype(jnp.float32).reshape(c, 1)
    z = _run_conv(xbuf, w_t, bias, act, x.dtype, interpret)
    return z[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pos_conv_gelu(x, w, b, groups: int, gelu: str = "erf",
                  interpret: bool = False):
    """GELU(grouped_conv1d_same_trimmed(x, w, b)) on packed (B, N, C).

    x: (B, N, C); w: (K, C//groups, C) flax conv kernel layout;
    b: (C,). Matches ``PositionalConvEmbedding``'s XLA branch
    (models/hubert.py): nn.Conv(feature_group_count=groups,
    padding=(K//2, K//2)) with the trailing element trimmed for even K,
    then exact GELU ("erf"; the in-kernel form is the A&S rational
    polynomial from ops/pallas_mlp).
    """
    return _pos_conv_impl(x, w, b, groups, interpret, act=gelu)


def _pc_fwd(x, w, b, groups, gelu, interpret):
    z = _pos_conv_impl(x, w, b, groups, interpret, act="id")
    y = _GELUS[gelu](z).astype(z.dtype)
    return y, (x, w, b, z)


def _pc_bwd(groups, gelu, interpret, res, dy):
    x, w, b, z = res
    bsz, n, c = x.shape
    k = w.shape[0]
    npad = _npad_for(n, k)

    # dz = dy * gelu'(z), db: plain XLA (fuses into neighbours).
    _, gvjp = jax.vjp(lambda t: _GELUS[gelu](t).astype(dy.dtype), z)
    (dz,) = gvjp(dy)
    db = jnp.sum(dz.astype(jnp.float32), axis=(0, 1))

    # dW: window stacks x cotangent, accumulated over the batch grid.
    xbuf = _pad_fwd(x, k, npad)
    dzp = jnp.pad(dz, ((0, 0), (0, npad - n), (0, 0)))
    g, cpg = groups, c // groups
    dw_t = pl.pallas_call(
        functools.partial(
            _dw_kernel, g=g, cpg=cpg, kk=k, tpad=npad
        ),
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, npad + k, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, npad, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((g, cpg, k * cpg), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, cpg, k * cpg), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xbuf, dzp, jnp.zeros((1, 1), jnp.int32))
    dw = _unprep_dw(dw_t, k)

    # dX: forward kernel with flipped/swapped weights, id activation.
    left = k - 1 - k // 2
    right = npad + k - left - n
    dzbuf = jnp.pad(dz, ((0, 0), (left, right), (0, 0)))
    wf_t = _prep_w_flip(w, groups).astype(dz.dtype)
    zero_bias = jnp.zeros((c, 1), jnp.float32)
    dx = _run_conv(dzbuf, wf_t, zero_bias, "id", dz.dtype, interpret)
    dx = dx[:, :n]

    return dx.astype(x.dtype), dw.astype(w.dtype), db.astype(b.dtype)


pos_conv_gelu.defvjp(_pc_fwd, _pc_bwd)
