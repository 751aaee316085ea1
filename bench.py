"""Benchmark: tri-modal clips/sec/chip (fwd + loss) at bf16.

BASELINE.json metric: "Tri-modal clips/sec/chip (fwd+loss)"; north-star
target is >=5,000 clips/sec aggregate on a v5e-8 at global batch 512 =
625 clips/sec/chip. This bench runs the flagship full-size tri-modal
model (DINOv2 ViT-B/14+reg+LoRA, HuBERT-base on 10 s audio, DistilBERT)
plus both max-mean InfoNCE losses on ONE chip at the per-chip batch
(512/8 = 64) and reports clips/sec/chip. vs_baseline is the ratio to the
625 target.

Every encoder input is perturbed by the scan carry — an earlier
version perturbed only images, which let XLA hoist the loop-invariant
audio/text encoders out of the timing scan and overstated throughput
~2.3x. iters=10 because the axon tunnel's single scalar readback costs
~30 ms RTT, which is amortized across the in-program scan iterations
(at iters=5 the RTT inflated the apparent step by ~6 ms; longer scans
amortize further but the remote compile time grows with scan length —
iters=20 exceeded 10 minutes).

Prints exactly one JSON line.

``python bench.py --dp512`` measures the TRUE north-star shape instead
(VERDICT r3 item 1): the composed DP-512 step — per-chip B=64 tri-modal
forward plus BOTH row-block losses against a 512-clip all-gathered
global key set, the shape each chip computes under DP-8 at global batch
512 (parallel/dp.py row-block semantics). Also exactly one JSON line;
vs_baseline is the same ratio to the 625 clips/s/chip pro-rata target,
so ``value >= 625`` here means the aggregate >= 5,000 clips/s north
star clears at its own shape.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _init_deadline(timeout_s: float = 900.0):
    """Fail fast when the TPU tunnel is down.

    Initializing the axon backend blocks INDEFINITELY when the tunnel
    is unresponsive (observed: multi-hour outage, round 2). A daemon
    watchdog aborts the process with a clear error unless backend init
    completes within the deadline — no duplicate init on the happy
    path. Returns a cancel callable."""
    import os
    import sys
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(
                f"bench.py: TPU backend did not initialize within "
                f"{timeout_s:.0f}s (tunnel down?) — aborting instead "
                f"of hanging",
                file=sys.stderr, flush=True,
            )
            os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()
    return done.set


def _wait_for_tpu(window_s: float, probe_timeout_s: float = 300.0) -> bool:
    """Retry/backoff for a flapping tunnel before the fail-fast.

    The driver runs this bench once at end of round; if the axon tunnel
    happens to be down at that moment, failing instantly forfeits the
    round's number even though the tunnel may return minutes later
    (observed: multi-hour outage with recovery, round 2). Probe in a
    SUBPROCESS (in-process backend init blocks forever and cannot be
    retried) every 60 s until the window expires. Returns True when a
    probe sees a device. Window: TRIAD_BENCH_RETRY_S (default 1800)."""
    import subprocess
    import sys
    import time as _time

    deadline = _time.monotonic() + window_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('ok')"],
                timeout=probe_timeout_s, capture_output=True, text=True,
            )
            if r.returncode == 0 and "ok" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        remaining = deadline - _time.monotonic()
        if remaining <= 0:
            return False
        print(
            f"bench.py: TPU probe attempt {attempt} failed; retrying "
            f"({remaining:.0f}s left in retry window)",
            file=sys.stderr, flush=True,
        )
        _time.sleep(min(60.0, max(1.0, remaining)))


def main() -> None:
    import os as _os_pre
    import sys as _sys_pre

    _window = float(_os_pre.environ.get("TRIAD_BENCH_RETRY_S", "1800"))
    _probe_s = float(_os_pre.environ.get("TRIAD_BENCH_PROBE_S", "300"))
    if not _wait_for_tpu(_window, probe_timeout_s=_probe_s):
        print(
            f"bench.py: no TPU backend after {_window:.0f}s of retries "
            f"(tunnel down) — aborting instead of hanging",
            file=_sys_pre.stderr, flush=True,
        )
        raise SystemExit(2)

    _init_ok = _init_deadline()
    import jax

    jax.devices()  # force backend init under the watchdog deadline
    _init_ok()

    # Persistent compile cache: the tunneled TPU compile is slow (~min);
    # cached reruns start instantly.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from triad_tpu.core.config import (
        perf_eval_loss_config,
        perf_eval_model_config,
    )

    # Production eval knobs — shared with scripts/tpu_profile_trace.py
    # so the profiled program IS the judged program. Everything computes
    # at bf16-or-better per the metric's contract; see the helper's
    # docstring (core/config.py) and docs/TRAINING_PERF.md for the
    # measurement history (501.3 with erf MLP GELUs -> 519.7 with tanh).
    # The parity defaults (fp32 scores, xla mlp, erf gelu, conv
    # frontend) stay for torch comparisons.
    cfg = perf_eval_model_config()
    loss_cfg = perf_eval_loss_config()
    # A/B hygiene: TRIAD_BENCH_LOSS=chunked|pallas overrides the loss
    # implementation so regressions can be bisected under identical
    # run conditions (tunnel/thermal drift is ~1-2%).
    import dataclasses as _dc
    import os as _os

    # Same-day drift discipline (VERDICT r4 item 8): the record holds
    # 651.8 / 646.1 / 653.4 for one config across days (~1% drift), so
    # a knob result is only interpretable next to a SAME-RUN baseline.
    # When any TRIAD_BENCH_* knob is set, this invocation also measures
    # the codified config and the one JSON line carries the pair.
    _knob_envs = sorted(
        k for k in _os.environ if k.startswith("TRIAD_BENCH_")
        and k not in ("TRIAD_BENCH_RETRY_S", "TRIAD_BENCH_PROBE_S")
    )

    _loss_ov = _os.environ.get("TRIAD_BENCH_LOSS")
    if _loss_ov:
        loss_cfg = _dc.replace(loss_cfg, implementation=_loss_ov)
    _chunk_ov = _os.environ.get("TRIAD_BENCH_LOSS_CHUNK")
    if _chunk_ov:
        loss_cfg = _dc.replace(loss_cfg, chunk_size=int(_chunk_ov))
    # TRIAD_BENCH_VOLUME_DTYPE=bfloat16: store the (Bq, chunk, Nq, Nk)
    # token-sim volume in bf16 between the matmul and its max/clamp
    # consumers (f32 MXU accumulation unchanged) — halves the loss
    # path's dominant HBM traffic; the same bf16-or-better contract as
    # attention_scores_dtype.
    _vd_ov = _os.environ.get("TRIAD_BENCH_VOLUME_DTYPE")
    if _vd_ov:
        loss_cfg = _dc.replace(loss_cfg, volume_dtype=_vd_ov)
    # More A/B knobs for bisecting under identical run conditions:
    # TRIAD_BENCH_WAVE=x10|x640 (frontend waveform shipping layout),
    # TRIAD_BENCH_POSCONV=conv|pallas (positional grouped conv impl).
    _wave_ov = _os.environ.get("TRIAD_BENCH_WAVE")
    _pc_ov = _os.environ.get("TRIAD_BENCH_POSCONV")
    _tb_ov = _os.environ.get("TRIAD_BENCH_FE_TB")
    if _wave_ov or _pc_ov or _tb_ov:
        hub = cfg.hubert
        if _wave_ov:
            hub = _dc.replace(hub, frontend_wave_layout=_wave_ov)
        if _pc_ov:
            hub = _dc.replace(hub, posconv_impl=_pc_ov)
        if _tb_ov:
            hub = _dc.replace(hub, frontend_tb=int(_tb_ov))
        cfg = _dc.replace(cfg, hubert=hub)
    # TRIAD_BENCH_VIT_ATTN=packed re-checks the ViT eval attention
    # kernel in the current program (the in-program trace shows ~6.8 ms
    # of probs/transpose fusions vs a ~1 ms kernel estimate; the
    # earlier "neutral" verdict predates the current layout set).
    _va_ov = _os.environ.get("TRIAD_BENCH_VIT_ATTN")
    if _va_ov:
        cfg = _dc.replace(
            cfg, vit=_dc.replace(cfg.vit, attention_impl=_va_ov)
        )
    # TRIAD_BENCH_HUBERT_ATTN=packed_merged: one (C, 3C) qkv matmul per
    # layer feeding the merged-layout eval kernel (q/k/v read at lane
    # offsets in-kernel; the activation is read from HBM once instead
    # of three times — ops/pallas_attention.py merged section).
    _ha_ov = _os.environ.get("TRIAD_BENCH_HUBERT_ATTN")
    if _ha_ov:
        cfg = _dc.replace(
            cfg, hubert=_dc.replace(cfg.hubert, attention_impl=_ha_ov)
        )
    # TRIAD_BENCH_ATTN_PAD=none|hbm: ragged token dim straight into the
    # eval attention kernels vs the jnp.pad HBM copies (~4.8 ms/step of
    # pure pad fusions in the r3b trace).
    _ap_ov = _os.environ.get("TRIAD_BENCH_ATTN_PAD")
    if _ap_ov:
        cfg = _dc.replace(
            cfg,
            hubert=_dc.replace(cfg.hubert, attention_pad=_ap_ov),
            vit=_dc.replace(cfg.vit, attention_pad=_ap_ov),
        )
    # TRIAD_BENCH_LN=fused|xla: HuBERT residual+LN impl at eval. The
    # trace shows ~8.6 ms/step of XLA LN stats fusions running at ~50%
    # HBM bandwidth; the fused add+LN kernel does stats+apply in one
    # VMEM pass (ln_impl "auto" only engages it when dropout is live).
    _ln_ov = _os.environ.get("TRIAD_BENCH_LN")
    _lr_ov = _os.environ.get("TRIAD_BENCH_LN_ROWS")
    if _ln_ov or _lr_ov:
        hub = cfg.hubert
        if _ln_ov:
            hub = _dc.replace(hub, ln_impl=_ln_ov)
        if _lr_ov:
            hub = _dc.replace(hub, ln_block_rows=int(_lr_ov))
        cfg = _dc.replace(cfg, hubert=hub)
    # TRIAD_BENCH_MLP_ROWS=2|4: batch rows merged per fused-MLP grid
    # step (numerics identical — row-independent math; targets the
    # per-grid-step pipeline bubbles behind the HuBERT MLP's 48% MFU).
    _mr_ov = _os.environ.get("TRIAD_BENCH_MLP_ROWS")
    if _mr_ov:
        rb = int(_mr_ov)
        cfg = _dc.replace(
            cfg,
            hubert=_dc.replace(cfg.hubert, mlp_block_rows=rb),
            vit=_dc.replace(cfg.vit, mlp_block_rows=rb),
        )
    # TRIAD_BENCH_PARAM_DTYPE=bfloat16: store parameters as bf16. The
    # judged forward already CASTS every weight to bf16 before its
    # matmul (compute_dtype), so the math is unchanged at bf16
    # rounding — this knob only halves the ~1 GB/step of fp32 weight
    # bytes read from HBM (expected ~0.5-0.6 ms at B=64).
    _pd_ov = _os.environ.get("TRIAD_BENCH_PARAM_DTYPE")
    if _pd_ov:
        cfg = _dc.replace(cfg, param_dtype=_pd_ov)
    # TRIAD_BENCH_QUANT=int8: the opt-in int8 serving mode (NOT the
    # judged number — BASELINE's contract is bf16; this is the
    # scored-separately measurement). Dense matmuls run int8 on the
    # MXU (2x bf16 peak on v5e); needs the plain-XLA impls since the
    # fused Pallas kernels bypass the Dense interception.
    _quant = _os.environ.get("TRIAD_BENCH_QUANT")
    if _quant == "int8":
        from triad_tpu.core.config import ModelConfig

        cfg = ModelConfig()  # default xla impls, full size

    dp512 = "--dp512" in _sys_pre.argv
    clips_per_sec = _measure(cfg, loss_cfg, _quant, dp512)

    target_per_chip = 5000.0 / 8.0
    metric = (
        "tri-modal clips/sec/chip (fwd+loss, bf16, DP-512 composed: "
        "B=64 vs 512 global keys)"
        if dp512
        else "tri-modal clips/sec/chip (fwd+loss, bf16, B=64, 10s audio)"
    )
    out = {
        "metric": metric,
        "value": round(clips_per_sec, 1),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / target_per_chip, 3),
    }
    if _knob_envs:
        base = _measure(
            perf_eval_model_config(), perf_eval_loss_config(), None, dp512
        )
        out["knobs"] = _knob_envs
        out["same_day_codified_baseline"] = round(base, 1)
    print(json.dumps(out))


def _measure(cfg, loss_cfg, _quant, dp512: bool) -> float:
    """Compile + time one configuration; returns clips/s/chip."""
    import jax
    import jax.numpy as jnp

    from triad_tpu.models import TriadModel, init_triad_model
    from triad_tpu.ops import av_loss, tv_loss

    B = 64  # per-chip share of the global-512 target config
    # 10 s @ 16 kHz. (Zero-padding to 163,920 samples for Na=512 tile
    # alignment measured 430 vs 448 clips/s — ragged 499 is fine.)
    AUDIO_SAMPLES = 160_000
    TEXT_LEN = 32
    model = TriadModel(cfg)
    params = init_triad_model(cfg, jax.random.key(0))

    if dp512:
        # The composed DP-512 design point: this chip's 64 clips scored
        # against the 512-clip all-gathered global key set, row-block
        # InfoNCE with labels at this chip's offset (parallel/dp.py),
        # both pairs. kv is bf16 like the production all-gather payload.
        from triad_tpu.ops.similarity import aggregate_crossbatch

        BK = 512
        _rng_kv = np.random.default_rng(1)
        kv = jnp.asarray(
            _rng_kv.normal(size=(BK, 256, 512)).astype(np.float32),
            jnp.bfloat16,
        )

        def _row_infonce(agg, n_q):
            s = agg.clip_sims
            lse = jax.nn.logsumexp(s, axis=1)
            pos = jnp.diagonal(s[:, :n_q])
            return jnp.mean(lse - pos) + agg.nonneg_sq_sum / agg.volume_numel

        def fwd_loss(params, images, audio, token_ids, text_mask):
            out = model.apply(
                {"params": params}, images, audio, token_ids, text_mask,
                train=False,
            )
            temp = params["temperature"]
            av = aggregate_crossbatch(
                out["audio"], kv, temp, clamp_min=-60.0,
                implementation=loss_cfg.implementation,
                chunk_size=loss_cfg.chunk_size,
                compute_diag=False, precision="default",
                volume_dtype=loss_cfg.volume_dtype,
            )
            tv = aggregate_crossbatch(
                out["text"], kv, temp, clamp_min=-20.0,
                query_mask=text_mask,
                implementation=loss_cfg.implementation,
                chunk_size=loss_cfg.chunk_size,
                compute_diag=False, precision="default",
                volume_dtype=loss_cfg.volume_dtype,
            )
            n_q = out["audio"].shape[0]
            return _row_infonce(av, n_q) + _row_infonce(tv, n_q)

    else:
        def fwd_loss(params, images, audio, token_ids, text_mask):
            if _quant == "int8":
                from triad_tpu.models.quantize import int8_interception

                with int8_interception():
                    out = model.apply(
                        {"params": params}, images, audio, token_ids,
                        text_mask, train=False,
                    )
            else:
                out = model.apply(
                    {"params": params}, images, audio, token_ids, text_mask,
                    train=False,
                )
            temp = params["temperature"]
            av = av_loss(out["audio"], out["visual"], temp, loss_cfg)
            tv = tv_loss(out["text"], out["visual"], text_mask, temp, loss_cfg)
            return av.total + tv.total

    # Timing methodology: the axon tunnel's block_until_ready does not
    # actually wait, and each host readback costs ~20-30 ms RTT — so the
    # steps are chained *inside one jit* via lax.scan (each iteration's
    # input depends on the previous loss so XLA cannot hoist or CSE the
    # body) and a single scalar readback ends the clock.
    def chained(params, images, audio, token_ids, text_mask, iters):
        def body(carry, _):
            # EVERY model input must depend on the carry, or XLA hoists
            # that encoder out of the scan and the bench under-counts
            # (perturbing only images once measured visual+loss alone).
            imgs = images + carry * 1e-12
            aud = audio + carry * 1e-12
            # token_ids are ints: route through a data-dependent select
            # (carry is never > 1e30, but XLA cannot prove that).
            toks = jnp.where(carry > 1e30, token_ids + 1, token_ids)
            loss = fwd_loss(params, imgs, aud, toks, text_mask)
            return loss, None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return total

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
    audio = jnp.asarray(
        (rng.normal(size=(B, AUDIO_SAMPLES)) * 0.1).astype(np.float32)
    )
    token_ids = jnp.asarray(rng.integers(1, 30_000, size=(B, TEXT_LEN)).astype(np.int32))
    text_mask = jnp.ones((B, TEXT_LEN), jnp.float32)

    iters = 10
    run = jax.jit(chained, static_argnames="iters")
    # Warm with the SAME static iters (a different value would recompile).
    float(run(params, images, audio, token_ids, text_mask, iters=iters))
    t0 = time.perf_counter()
    float(run(params, images, audio, token_ids, text_mask, iters=iters))
    dt = (time.perf_counter() - t0) / iters

    return B / dt


if __name__ == "__main__":
    main()
