"""Eval-forward knob sweep on the real TPU — the judged bench path.

Measures the audio (HuBERT) and visual (ViT) encoders' eval forward at
B=64 bf16 under the implementation knobs:

  audio: attention_scores_dtype {float32, bfloat16} x attention_impl
         {xla, flash} x mlp_impl {xla, fused} x frontend {conv,
         block_matmul} x waveform length {160000 (Na=499), 163850
         (Na=512, lane-aligned)}
  visual: attention_scores_dtype x attention_impl

Timing: chained lax.scan with carry-perturbed inputs (the axon tunnel's
block_until_ready doesn't wait; one scalar readback ends the clock).
Run: python scripts/tpu_eval_sweep.py [audio|visual|combo]
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

import jax.numpy as jnp
import numpy as np

from triad_tpu.core.config import HubertConfig, ViTConfig

B = 64
ITERS = 5


def time_fn(label, fn, params, *args):
    # params must travel as a jit ARGUMENT: closed-over params become
    # HLO constants and the axon remote-compile upload rejects the
    # multi-hundred-MB request body (HTTP 413).
    def chained(params, *args):
        def body(c, _):
            pert = [
                a + (c * 1e-12).astype(a.dtype) if a.dtype != jnp.int32 else a
                for a in args
            ]
            out = fn(params, *pert)
            return jnp.sum(out.astype(jnp.float32) * 1e-12), None

        r, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return r

    j = jax.jit(chained)
    t0 = time.perf_counter()
    float(j(params, *args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(j(params, *args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:58s} {dt * 1e3:8.2f} ms  (compile {compile_s:.0f}s)", flush=True)
    return dt


def sweep_audio():
    from triad_tpu.models.hubert import HubertModel, normalize_waveform

    rng = np.random.default_rng(0)
    base = HubertConfig()
    params = None

    variants = [
        # "auto" now = fused mlp at eval; deterministic forward also
        # uses the monolithic frontend (no duplicate conv_0).
        ("auto (fused mlp + monolithic fe)", {}, 160_000),
        (
            "auto + bf16 scores",
            {"attention_scores_dtype": "bfloat16"}, 160_000,
        ),
        (
            "auto + bf16 scores + flash",
            {
                "attention_scores_dtype": "bfloat16",
                "attention_impl": "flash",
            },
            160_000,
        ),
    ]
    for label, over, T in variants:
        cfg = dataclasses.replace(base, **over)
        model = HubertModel(cfg, dtype=jnp.bfloat16)
        audio = jnp.asarray(
            (rng.normal(size=(B, T)) * 0.1).astype(np.float32)
        )
        audio = normalize_waveform(audio)
        if params is None:
            params = model.init(jax.random.key(0), audio[:1, :160_000])["params"]
        fn = lambda p, a, m=model: m.apply({"params": p}, a, deterministic=True)
        time_fn(f"audio {label}", fn, params, audio)


def sweep_visual():
    from triad_tpu.models.vit import DinoViT

    rng = np.random.default_rng(0)
    base = ViTConfig()
    images = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
    params = None
    for label, over in [
        ("baseline (f32 scores, xla attn, xla mlp)", {}),
        ("bf16 scores", {"attention_scores_dtype": "bfloat16"}),
        ("flash attn", {"attention_impl": "flash"}),
        ("fused mlp", {"mlp_impl": "fused"}),
        (
            "bf16 scores + fused mlp",
            {"attention_scores_dtype": "bfloat16", "mlp_impl": "fused"},
        ),
    ]:
        cfg = dataclasses.replace(base, **over)
        model = DinoViT(cfg, dtype=jnp.bfloat16)
        if params is None:
            params = model.init(jax.random.key(0), images[:1])["params"]
        fn = lambda p, im, m=model: m.apply({"params": p}, im)
        time_fn(f"visual {label}", fn, params, images)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "audio"
    print(f"devices: {jax.devices()}")
    if which in ("audio", "all"):
        sweep_audio()
    if which in ("visual", "all"):
        sweep_visual()
