"""jax.profiler trace of the eval forward (the judged bench program) or
the joint train step, with an op-level breakdown parsed from the xplane
(tensorboard_plugin_profile) — ground truth where chained-scan timing
through the tunnel is too noisy.

Run: python scripts/tpu_profile_trace.py [eval|train] [outdir]
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
    # train path) — for tracing the loss-impl A/B.
    loss_cfg = LossConfig(
        implementation=os.environ.get("TRIAD_TRAIN_LOSS", "chunked"),
        chunk_size=16,
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
    fn, args = build_eval_fn() if what == "eval" else build_train_fn()
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
