"""jax.profiler trace of the eval forward (the judged bench program) or
the joint train step, with an op-level breakdown parsed from the xplane
(tensorboard_plugin_profile) — ground truth where chained-scan timing
through the tunnel is too noisy.

Run: python scripts/tpu_profile_trace.py [eval|train|dp512] [outdir]
"""

import functools
import glob
import os
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import jax.numpy as jnp
import numpy as np

B = 64
AUDIO_SAMPLES = 160_000
TEXT_LEN = 32


def build_eval_fn():
    from triad_tpu.core.config import (
        perf_eval_loss_config,
        perf_eval_model_config,
    )
    from triad_tpu.models import TriadModel, init_triad_model
    from triad_tpu.ops import av_loss, tv_loss

    # The judged bench configuration (bench.py uses the same helper).
    # TRIAD_FRONTEND overrides the frontend impl for A/B traces.
    cfg = perf_eval_model_config()
    fe = os.environ.get("TRIAD_FRONTEND")
    if fe:
        cfg = dataclasses.replace(
            cfg, hubert=dataclasses.replace(cfg.hubert, frontend_impl=fe)
        )
    wv = os.environ.get("TRIAD_EVAL_WAVE")
    if wv:
        cfg = dataclasses.replace(
            cfg,
            hubert=dataclasses.replace(cfg.hubert, frontend_wave_layout=wv),
        )
    pc = os.environ.get("TRIAD_EVAL_POSCONV")
    if pc:
        cfg = dataclasses.replace(
            cfg, hubert=dataclasses.replace(cfg.hubert, posconv_impl=pc)
        )
    mr = os.environ.get("TRIAD_EVAL_MLP_ROWS")
    if mr:
        cfg = dataclasses.replace(
            cfg,
            hubert=dataclasses.replace(cfg.hubert, mlp_block_rows=int(mr)),
            vit=dataclasses.replace(cfg.vit, mlp_block_rows=int(mr)),
        )
    loss_cfg = perf_eval_loss_config()
    loss_ov = os.environ.get("TRIAD_EVAL_LOSS")
    if loss_ov:
        loss_cfg = dataclasses.replace(loss_cfg, implementation=loss_ov)
    model = TriadModel(cfg)
    params = init_triad_model(cfg, jax.random.key(0))

    def fwd_loss(params, images, audio, token_ids, text_mask):
        out = model.apply(
            {"params": params}, images, audio, token_ids, text_mask, train=False
        )
        temp = params["temperature"]
        av = av_loss(out["audio"], out["visual"], temp, loss_cfg)
        tv = tv_loss(out["text"], out["visual"], text_mask, temp, loss_cfg)
        return av.total + tv.total

    rng = np.random.default_rng(0)
    args = (
        params,
        jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32)),
        jnp.asarray(
            (rng.normal(size=(B, AUDIO_SAMPLES)) * 0.1).astype(np.float32)
        ),
        jnp.asarray(
            rng.integers(1, 30_000, size=(B, TEXT_LEN)).astype(np.int32)
        ),
        jnp.ones((B, TEXT_LEN), jnp.float32),
    )
    return jax.jit(fwd_loss), args


def build_train_fn():
    from triad_tpu.core.config import LossConfig, ModelConfig, OptimConfig
    from triad_tpu.models import init_triad_model
    from triad_tpu.train.optim import OptimizerBank, ParamPartition
    from triad_tpu.train.step import StepFactory, init_train_state

    # TRIAD_TRAIN_KNOBS: same comma-separated knobs as
    # scripts/tpu_train_bench.py — applied by the SHARED
    # core.config.apply_train_knobs so the traced program is the
    # measured program (the scripts previously carried drifting copies).
    from triad_tpu.core.config import apply_train_knobs

    model_cfg = apply_train_knobs(
        ModelConfig(), os.environ.get("TRIAD_TRAIN_KNOBS", "")
    )
    # TRIAD_TRAIN_LOSS=chunked|pallas (default chunked, the production
    # train path) — for tracing the loss-impl A/B. Chunk 32 = the
    # codified DP-512 winner (r3h sweep); TRIAD_TRAIN_CHUNK overrides.
    loss_cfg = LossConfig(
        implementation=os.environ.get("TRIAD_TRAIN_LOSS", "chunked"),
        chunk_size=int(os.environ.get("TRIAD_TRAIN_CHUNK", "32")),
        # Production train loss runs bf16-operand/f32-accum matmuls
        # (configs/v5e8_scale.yaml matmul_precision: default); the
        # LossConfig default is "highest" (parity), which would trace a
        # 4x-slower aggregation than the step being accounted for.
        matmul_precision=os.environ.get("TRIAD_TRAIN_PRECISION", "default"),
    )
    optim_cfg = OptimConfig(gradient_accumulation_steps=1)
    params = init_triad_model(model_cfg, jax.random.key(0))
    bank = OptimizerBank(optim_cfg, ParamPartition(params), total_updates=1000)
    factory = StepFactory(model_cfg, loss_cfg, optim_cfg, bank)
    state = init_train_state(params, bank, jax.random.key(1))
    rng = np.random.default_rng(0)
    av = {
        "images": jnp.asarray(
            rng.normal(size=(B, 224, 224, 3)).astype(np.float32)
        ),
        "audio": jnp.asarray(
            (rng.normal(size=(B, AUDIO_SAMPLES)) * 0.1).astype(np.float32)
        ),
    }
    tv = {
        "images": jnp.asarray(
            rng.normal(size=(B, 224, 224, 3)).astype(np.float32)
        ),
        "token_ids": jnp.asarray(
            rng.integers(1, 30_000, size=(B, TEXT_LEN)).astype(np.int32)
        ),
        "text_mask": jnp.ones((B, TEXT_LEN), jnp.float32),
    }
    raw_step = factory.make_step("joint")
    one = jnp.float32(1.0)

    # donate the state like the production trainer — without it the old
    # and new optimizer states coexist (+4 GB) and B=64 OOMs.
    @functools.partial(jax.jit, donate_argnums=0)
    def run(state):
        state, _metrics = raw_step(state, av, tv, one, one)
        return (state,)

    return run, (state,)


def build_dp512_fn():
    """The composed DP-512 north-star program (bench.py --dp512): the
    full tri-modal eval forward at per-chip B=64 plus BOTH row-block
    losses against a 512-clip all-gathered key set, at the codified
    perf_eval + chunk-32 config. This is the program whose 102.69 ms
    (r3h) the >=625 clips/s/chip target prices at <=102.4 ms."""
    from triad_tpu.core.config import (
        perf_eval_loss_config,
        perf_eval_model_config,
    )
    from triad_tpu.models import TriadModel, init_triad_model
    from triad_tpu.ops.similarity import aggregate_crossbatch

    cfg = perf_eval_model_config()
    loss_cfg = perf_eval_loss_config()
    chunk_ov = os.environ.get("TRIAD_BENCH_LOSS_CHUNK")
    if chunk_ov:
        loss_cfg = dataclasses.replace(loss_cfg, chunk_size=int(chunk_ov))
    vd_ov = os.environ.get("TRIAD_BENCH_VOLUME_DTYPE")
    if vd_ov:
        loss_cfg = dataclasses.replace(loss_cfg, volume_dtype=vd_ov)
    model = TriadModel(cfg)
    params = init_triad_model(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
    audio = jnp.asarray(
        (rng.normal(size=(B, AUDIO_SAMPLES)) * 0.1).astype(np.float32)
    )
    token_ids = jnp.asarray(
        rng.integers(1, 30_000, size=(B, TEXT_LEN)).astype(np.int32)
    )
    text_mask = jnp.ones((B, TEXT_LEN), jnp.float32)
    kv = jnp.asarray(
        np.random.default_rng(1).normal(size=(512, 256, 512))
        .astype(np.float32),
        jnp.bfloat16,
    )

    def row_infonce(agg):
        s = agg.clip_sims
        lse = jax.nn.logsumexp(s, axis=1)
        pos = jnp.diagonal(s[:, :B])
        return jnp.mean(lse - pos) + agg.nonneg_sq_sum / agg.volume_numel

    @jax.jit
    def run(images, audio, token_ids, text_mask, kv):
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
            out["text"], kv, temp, clamp_min=-20.0, query_mask=text_mask,
            implementation=loss_cfg.implementation,
            chunk_size=loss_cfg.chunk_size,
            compute_diag=False, precision="default",
            volume_dtype=loss_cfg.volume_dtype,
        )
        return (row_infonce(av) + row_infonce(tv),)

    return run, (images, audio, token_ids, text_mask, kv)


def summarize(logdir: str, top: int = 45, n_steps: int = 3) -> None:
    """Parse the xplane trace directly (the tensorboard_plugin_profile
    converter is version-broken against this TF): aggregate 'XLA Ops'
    event durations by op name, print the top entries (per traced
    step). Needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python with the
    baked-in protobuf."""
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        print("no xplane found under", logdir)
        return
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(sorted(paths)[-1], "rb").read())
    for plane in xs.planes:
        if not plane.name.startswith("/device:"):
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        total_all = 0.0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e9  # ps -> ms
                totals[name] += dur
                counts[name] += 1
                total_all += dur
        if not totals:
            continue
        print(
            f"-- {plane.name}: {total_all / n_steps:.1f} ms/step device "
            f"time, top {top} ops (ms/step, count/step) --"
        )
        for name in sorted(totals, key=lambda k: -totals[k])[:top]:
            print(
                f"{totals[name] / n_steps:9.3f} ms  x{counts[name] // n_steps:<4d}"
                f" {name[:100]}"
            )


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "eval"
    logdir = (
        sys.argv[2] if len(sys.argv) > 2 else f"/tmp/triad_trace_{what}"
    )
    if what == "eval":
        fn, args = build_eval_fn()
    elif what == "dp512":
        fn, args = build_dp512_fn()
    else:
        fn, args = build_train_fn()
    # compile outside the trace; in train mode the state is donated and
    # threaded through (args is the 1-tuple (state,)).
    out = fn(*args)
    if what == "train":
        args = out
    jax.block_until_ready(out)
    time.sleep(1)
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        out = fn(*args)
        if what == "train":
            args = out
    jax.block_until_ready(out)
    # the tunnel's block_until_ready does not actually wait — force a
    # readback to drain the device queue before stopping the trace.
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    jax.profiler.stop_trace()
    print("trace written to", logdir)
    summarize(logdir)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
