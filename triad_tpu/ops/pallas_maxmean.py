"""Fused Pallas TPU kernel for cross-batch max-mean aggregation.

The hot loss path (SURVEY §7.3 item 1): for every clip pair (i, j),
token sims ts[a, v] = <Q_i_a, K_j_v> * T, then max over key tokens and
weighted mean over query tokens => clip_sims (Bq, Bk), plus the
non-negativity regularizer sum over the whole (Bq, Bk, Nq, Nk) volume
(reference model.py:370-392, 417; the reference materializes the fp32
volume — ~247 MB at its shapes, ~33 TB at global batch 512).

Design (TPU-shaped):
  * forward: grid over query tiles (TQ clips each); the key set streams
    from HBM clip-by-clip through a double-buffered VMEM scratch
    (DMA overlapped with the MXU matmul (TQ*Nq, D) x (D, Nk));
    max / weighted-mean / clamp^2 reduce in VMEM; the (TQ, Bk) clip row
    block accumulates via one-hot column scatter (TPU lanes cannot be
    dynamically indexed); regularizer partials land in SMEM.
  * backward (custom VJP): flash-style recompute, no residual volume.
    A dQ pass (same streaming layout) and a dK pass (grid over key
    tiles, queries streamed) rebuild ts per pair and route gradients
    through the FIRST argmax (torch max subgradient, model.py:389) and
    the clamp window.
  * temperature gradient needs no extra pass: clip is linear in T and
    the clamp^2 term differentiates to (2/T) * active-window sum of
    ts^2, which the forward accumulates.

Query weighting is a per-token coefficient array ``coeff`` (Bq, Nq):
1/Nq for the plain mean (AV), mask/count for the masked mean (TV,
model.py:509-512), and 0 for rows added to pad Nq to the 128-lane tile
— one mechanism for all three.

The blockwise structure extends to chunked Nq (longer audio / ring
execution across chips) by adding an inner Nq-block loop with a running
max (SURVEY §5 long-context note).

STATUS — measured, NOT the production loss path. In the full eval
program the chunked-XLA scan (ops/similarity.py, bf16 matmul operands)
costs 3.1 ms/step at B=64 flagship shapes because XLA fuses the
normalize/temperature into neighbors and runs the token-sim matmuls in
bf16, while this kernel computes f32 in-kernel and costs 7.0 ms/step
(AV 5.5 + TV 1.5; xplane traces, docs/TRAINING_PERF.md "loss-impl A/B").
An isolated 20.4 ms-vs-8.95 ms "win" for this kernel did not survive
composition. The same holds at the kernel's own DESIGN POINT — the
global-batch-512 key set (DP all-gathered negatives, q (64,499,512) x
k (512,256,512)): measured IN COMPOSITION with the full eval forward on
the chip (scripts/loss_global512_ab.py, Aug 19 r3b), chunked 109.9
ms/step vs pallas 139.1 (matching loss values), i.e. the bf16 chunked
scan wins by 27 ms/step at 512 keys as well — linear-in-B_keys scaling
confirmed, kernel retired for production at every measured regime. At
training (B=64, fwd+bwd joint step) loss=pallas also measured 462.5 ms
vs chunked_vjp 455.7 (tpu_train_bench, same session). The kernel stays
as (a) the long-context/blockwise design artifact and (b) an A/B target
via LossConfig.implementation="pallas"; the default and the judged
bench use "chunked".
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile(b: int, target: int) -> int:
    t = min(target, b)
    while b % t != 0:
        t -= 1
    return t


def _matmul_qk(q2d, k2d):
    """(M, D) x (Nk, D)^T -> (M, Nk) f32 on the MXU."""
    return jax.lax.dot_general(
        q2d, k2d,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    temp_ref,  # SMEM (1, 1)
    q_ref,  # VMEM (TQ, Nq, D)
    coeff_ref,  # VMEM (TQ, Nq)
    k_hbm,  # ANY (Bk, Nk, D)
    clip_ref,  # out VMEM (TQ, Bk)
    nonneg_ref,  # out SMEM (gi, 1), row per grid cell
    tsq_ref,  # out SMEM (gi, 1)
    k_scratch,  # VMEM (2, Nk, D)
    sems,  # DMA (2,)
    *,
    tq: int, bk: int, nq: int, nk: int, d: int, clamp_min: float,
):
    temp = temp_ref[0, 0]
    q = q_ref[:].reshape(tq * nq, d)
    coeff = coeff_ref[:]

    def dma(slot, idx):
        return pltpu.make_async_copy(k_hbm.at[idx], k_scratch.at[slot], sems.at[slot])

    dma(0, 0).start()
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, bk), 1)

    def body(jj, carry):
        clip_acc, nn, tsq = carry
        slot = jj % 2

        @pl.when(jj + 1 < bk)
        def _():
            dma((jj + 1) % 2, jj + 1).start()

        dma(slot, jj).wait()
        k = k_scratch[slot]
        ts = _matmul_qk(q, k) * temp  # (TQ*Nq, Nk)
        clamped = jnp.clip(ts, clamp_min, 0.0)
        nn = nn + jnp.sum(clamped * clamped)
        active = jnp.logical_and(ts > clamp_min, ts < 0.0)
        tsq = tsq + jnp.sum(jnp.where(active, ts * ts, 0.0))
        max_v = jnp.max(ts.reshape(tq, nq, nk), axis=2)
        col = jnp.sum(max_v * coeff, axis=1)  # (TQ,)
        # one-hot column scatter (no dynamic lane indexing on TPU)
        clip_acc = clip_acc + jnp.where(col_ids == jj, col[:, None], 0.0)
        return clip_acc, nn, tsq

    clip_acc, nn, tsq = jax.lax.fori_loop(
        0, bk, body,
        (
            jnp.zeros((tq, bk), jnp.float32),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        ),
    )
    clip_ref[:] = clip_acc
    i = pl.program_id(0)
    nonneg_ref[i, 0] = nn
    tsq_ref[i, 0] = tsq


def _forward(q, k, temperature, coeff, clamp_min, tq):
    bq, nq, d = q.shape
    bk, nk = k.shape[0], k.shape[1]
    gi = bq // tq
    temp = temperature.astype(jnp.float32).reshape(1, 1)
    kernel = functools.partial(
        _fwd_kernel, tq=tq, bk=bk, nq=nq, nk=nk, d=d, clamp_min=clamp_min
    )
    clip, nonneg, tsq = pl.pallas_call(
        kernel,
        grid=(gi,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, nq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((tq, nq), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tq, bk), lambda i: (i, 0)),
            # full-array SMEM blocks (per-tile scalars land in row i);
            # (1,1) blocks violate the TPU (8,128)-tiling rule.
            pl.BlockSpec((gi, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((gi, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bq, bk), jnp.float32),
            jax.ShapeDtypeStruct((gi, 1), jnp.float32),
            jax.ShapeDtypeStruct((gi, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, nk, d), q.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(temp, q, coeff, k)
    return clip, jnp.sum(nonneg), jnp.sum(tsq)


# ---------------------------------------------------------------------------
# Backward helpers
# ---------------------------------------------------------------------------


def _dts_for_pair(q2d, k, g_col, coeff, g_nonneg, temp, clamp_min, tq, nq, nk):
    """dL/d(raw_sims) for one (q-tile, key-clip) pair: recompute ts,
    first-argmax one-hot routing for the max, clamp-window term, x T."""
    ts = _matmul_qk(q2d, k) * temp
    ts3 = ts.reshape(tq, nq, nk)
    amax = jnp.argmax(ts3, axis=2)  # first max index (torch semantics)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (tq, nq, nk), 2) == amax[..., None]
    )
    g_max = g_col[:, None] * coeff  # (TQ, Nq)
    dts = jnp.where(onehot, g_max[..., None], 0.0).reshape(tq * nq, nk)
    active = jnp.logical_and(ts > clamp_min, ts < 0.0)
    dts = dts + jnp.where(active, 2.0 * ts * g_nonneg, 0.0)
    return dts * temp


def _col_of(gclip_tile, jj, bk):
    """Read column jj of a (TQ, Bk) tile without dynamic lane indexing."""
    ids = jax.lax.broadcasted_iota(jnp.int32, gclip_tile.shape, 1)
    return jnp.sum(jnp.where(ids == jj, gclip_tile, 0.0), axis=1)


def _dq_kernel(
    scalars_ref,  # SMEM (1, 2): [temp, g_nonneg]
    q_ref, coeff_ref, gclip_ref,
    k_hbm,
    dq_ref,
    k_scratch, sems,
    *,
    tq, bk, nq, nk, d, clamp_min,
):
    temp = scalars_ref[0, 0]
    g_nonneg = scalars_ref[0, 1]
    q = q_ref[:].reshape(tq * nq, d)
    coeff = coeff_ref[:]
    gclip = gclip_ref[:]

    def dma(slot, idx):
        return pltpu.make_async_copy(k_hbm.at[idx], k_scratch.at[slot], sems.at[slot])

    dma(0, 0).start()

    def body(jj, acc):
        slot = jj % 2

        @pl.when(jj + 1 < bk)
        def _():
            dma((jj + 1) % 2, jj + 1).start()

        dma(slot, jj).wait()
        k = k_scratch[slot]
        g_col = _col_of(gclip, jj, bk)
        dts = _dts_for_pair(
            q, k, g_col, coeff, g_nonneg, temp, clamp_min, tq, nq, nk
        )
        return acc + jax.lax.dot_general(
            dts, k.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(0, bk, body, jnp.zeros((tq * nq, d), jnp.float32))
    dq_ref[:] = acc.reshape(tq, nq, d)


def _dk_kernel(
    scalars_ref,
    k_ref,  # VMEM (TKO, Nk, D) — this cell's key clips
    q_hbm, coeff_hbm, gclip_hbm,  # ANY
    dk_ref,  # out VMEM (TKO, Nk, D) f32
    q_scratch, coeff_scratch, gclip_scratch, sems,
    *,
    tko, tq, bq, nq, nk, d, clamp_min,
):
    j0 = pl.program_id(0) * tko
    temp = scalars_ref[0, 0]
    g_nonneg = scalars_ref[0, 1]
    gi = bq // tq

    def dma_all(slot, i):
        return (
            pltpu.make_async_copy(
                q_hbm.at[pl.ds(i * tq, tq)], q_scratch.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                coeff_hbm.at[pl.ds(i * tq, tq)], coeff_scratch.at[slot],
                sems.at[slot, 1],
            ),
            pltpu.make_async_copy(
                gclip_hbm.at[pl.ds(i * tq, tq)], gclip_scratch.at[slot],
                sems.at[slot, 2],
            ),
        )

    for c in dma_all(0, 0):
        c.start()

    def body(i, acc):
        slot = i % 2

        @pl.when(i + 1 < gi)
        def _():
            for c in dma_all((i + 1) % 2, i + 1):
                c.start()

        for c in dma_all(slot, i):
            c.wait()
        q = q_scratch[slot].reshape(tq * nq, d)
        coeff = coeff_scratch[slot]
        gclip = gclip_scratch[slot]  # (TQ, Bk)
        contribs = []
        for jj in range(tko):  # static small loop over this cell's keys
            k = k_ref[jj]
            g_col = _col_of(gclip, j0 + jj, gclip.shape[1])
            dts = _dts_for_pair(
                q, k, g_col, coeff, g_nonneg, temp, clamp_min, tq, nq, nk
            )
            contribs.append(
                jax.lax.dot_general(
                    dts, q.astype(jnp.float32),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (Nk, D)
            )
        # stack instead of acc.at[jj].add — static-index scatter-add has
        # no Mosaic lowering.
        return acc + jnp.stack(contribs)

    acc = jax.lax.fori_loop(
        0, gi, body, jnp.zeros((tko, nk, d), jnp.float32)
    )
    dk_ref[:] = acc


def _backward(q, k, temperature, coeff, clamp_min, tq, g_clip, g_nonneg):
    bq, nq, d = q.shape
    bk, nk = k.shape[0], k.shape[1]
    gi = bq // tq
    temp = temperature.astype(jnp.float32)
    scalars = jnp.stack([temp, g_nonneg.astype(jnp.float32)]).reshape(1, 2)
    g_clip = g_clip.astype(jnp.float32)

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, tq=tq, bk=bk, nq=nq, nk=nk, d=d, clamp_min=clamp_min
        ),
        grid=(gi,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, nq, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((tq, nq), lambda i: (i, 0)),
            pl.BlockSpec((tq, bk), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tq, nq, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bq, nq, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, nk, d), k.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(scalars, q, coeff, g_clip, k)

    # The dK pass streams g_clip rows via manual DMA; Mosaic requires the
    # lane (last) dim of a DMA slice to be 128-aligned, so pad Bk -> 128x.
    # Padded columns are never read (_col_of selects j0+jj < bk only).
    bk_pad = _round_up(bk, 128)
    g_clip_dk = (
        jnp.pad(g_clip, ((0, 0), (0, bk_pad - bk))) if bk_pad != bk else g_clip
    )
    tko = _pick_tile(bk, 4)
    gj = bk // tko
    dk = pl.pallas_call(
        functools.partial(
            _dk_kernel, tko=tko, tq=tq, bq=bq, nq=nq, nk=nk, d=d,
            clamp_min=clamp_min,
        ),
        grid=(gj,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tko, nk, d), lambda j: (j, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tko, nk, d), lambda j: (j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bk, nk, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tq, nq, d), q.dtype),
            pltpu.VMEM((2, tq, nq), jnp.float32),
            pltpu.VMEM((2, tq, bk_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(scalars, k, q, coeff, g_clip_dk)
    return dq, dk


# ---------------------------------------------------------------------------
# custom_vjp wrapper + public entries
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _maxmean(q, k, temperature, coeff, clamp_min, tq):
    return _forward(q, k, temperature, coeff, clamp_min, tq)


def _maxmean_fwd(q, k, temperature, coeff, clamp_min, tq):
    out = _forward(q, k, temperature, coeff, clamp_min, tq)
    clip, _, tsq = out
    return out, (q, k, temperature, coeff, clip, tsq)


def _maxmean_bwd(clamp_min, tq, residuals, grads):
    q, k, temperature, coeff, clip, tsq = residuals
    g_clip, g_nonneg, _g_tsq = grads  # tsq is internal: no cotangent expected
    dq, dk = _backward(q, k, temperature, coeff, clamp_min, tq, g_clip, g_nonneg)
    temp = temperature.astype(jnp.float32)
    dtemp = (
        jnp.sum(g_clip.astype(jnp.float32) * clip) / temp
        + g_nonneg.astype(jnp.float32) * 2.0 * tsq / temp
    )
    dcoeff = jnp.zeros_like(coeff)  # coeff comes from masks: non-diff
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dtemp.astype(temperature.dtype),
        dcoeff,
    )


_maxmean.defvjp(_maxmean_fwd, _maxmean_bwd)


def maxmean_aggregate_pallas(
    query: jax.Array,
    key: jax.Array,
    temperature: jax.Array,
    *,
    clamp_min: float,
    query_mask: Optional[jax.Array] = None,
    tile_q: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """(clip_sims (Bq, Bk) f32, nonneg_sq_sum () f32).

    query: (Bq, Nq, D); key: (Bk, Nk, D). Nq is padded to a 128 multiple
    internally (zero rows, zero coefficient); Nk and D must already be
    128-multiples (visual tokens: 256 x 512). Tiles must keep the
    sublane rule (tq a multiple of 8); the VMEM budget is raised past
    Mosaic's conservative 16 MB default (v5e has 128 MB physical VMEM).
    """
    bq, nq, d = query.shape
    bk, nk = key.shape[0], key.shape[1]
    if nk % 128 != 0 or d % 128 != 0:
        raise ValueError(f"Nk ({nk}) and D ({d}) must be multiples of 128")
    # The kernel's key scratch is typed after the query; mixed q/k
    # dtypes (e.g. an f32-promoted query against bf16 keys) would DMA
    # across element types — unify here.
    if key.dtype != query.dtype:
        key = key.astype(query.dtype)

    nq_pad = _round_up(nq, 128)
    if query_mask is None:
        coeff = jnp.full((bq, nq), 1.0 / nq, jnp.float32)
    else:
        m = query_mask.astype(jnp.float32)
        coeff = m / jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1e-7)
    if nq_pad != nq:
        query = jnp.pad(query, ((0, 0), (0, nq_pad - nq), (0, 0)))
        coeff = jnp.pad(coeff, ((0, 0), (0, nq_pad - nq)))

    tq = _pick_tile(bq, tile_q)
    clip, nonneg, _tsq = _maxmean(query, key, temperature, coeff, clamp_min, tq)
    return clip, nonneg


def aggregate_pallas(
    query: jax.Array,
    key: jax.Array,
    temperature: jax.Array,
    *,
    clamp_min: float,
    query_mask: Optional[jax.Array] = None,
    compute_diag: bool = True,
):
    """AggregateOut-compatible entry (see ops.similarity.aggregate_crossbatch).

    clip_sims semantics: masked mean uses mask/count coefficients —
    identical to the reference masked mean; the plain mean uses 1/Nq.
    nonneg_sq_sum covers real tokens only (padding rows contribute
    exactly 0, matching the unpadded computation); volume_numel is the
    real-token volume, so the caller's mean matches the XLA paths.
    """
    from triad_tpu.ops.similarity import AggregateOut, diag_token_sims

    bq, nq, _ = query.shape
    bk, nk = key.shape[0], key.shape[1]
    clip, nonneg = maxmean_aggregate_pallas(
        query, key, temperature,
        clamp_min=clamp_min, query_mask=query_mask,
    )
    numel = jnp.asarray(bq * bk * nq * nk, jnp.float32)
    diag = None
    if compute_diag and bq == bk:
        diag = diag_token_sims(query, key, temperature)
    return AggregateOut(clip, nonneg, numel, diag)
