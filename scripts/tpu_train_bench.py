"""Full training-step benchmark (joint AV+TV fwd+bwd+4-group update) at
the flagship shapes: B=64, 10 s audio, 32 text tokens — the shapes of
docs/TRAINING_PERF.md's measurement log (905 -> 764 -> 697 ms across
the round-1 fused kernels).

Timing: chained lax.scan (all encoder inputs perturbed per iteration),
one scalar readback; accum=1 so every step does a real parameter
update. State is donated like the production trainer.

Run: python scripts/tpu_train_bench.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from triad_tpu.core.config import LossConfig, ModelConfig, OptimConfig
from triad_tpu.models import init_triad_model
from triad_tpu.train.optim import OptimizerBank, ParamPartition
from triad_tpu.train.step import StepFactory, init_train_state

B = 64
AUDIO_SAMPLES = 160_000
TEXT_LEN = 32


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    loss_impl = sys.argv[2] if len(sys.argv) > 2 else "chunked"
    moments = sys.argv[3] if len(sys.argv) > 3 else "float32"
    # 4th arg: comma-separated perf knobs — the shared set documented
    # in core.config.apply_train_knobs. Default = parity config.
    knobs = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set()
    # 5th arg: loss chunk size (default 16 = the historical measurement
    # config; the codified production chunk is 32, neutral at B=64).
    chunk = int(sys.argv[5]) if len(sys.argv) > 5 else 16

    from triad_tpu.core.config import apply_train_knobs

    model_cfg = apply_train_knobs(ModelConfig(), knobs)
    loss_cfg = LossConfig(
        implementation=loss_impl, chunk_size=chunk, matmul_precision="default",
        # TRIAD_TRAIN_VOLUME_DTYPE: the (chunk, Nq, Nk) sim-volume
        # storage dtype, fwd AND custom-VJP recompute. Default bf16 ==
        # the r5 CODIFIED config (447.2 -> 441.1 ms same-session A/B;
        # the r5 trace showed the f32 chunk volumes dominating the loss
        # backward's 46.5 ms bucket). Set float32 to measure the
        # pre-r5 parity-volume path.
        volume_dtype=os.environ.get("TRIAD_TRAIN_VOLUME_DTYPE", "bfloat16"),
    )
    optim_cfg = OptimConfig(
        gradient_accumulation_steps=1, mu_dtype=moments, nu_dtype=moments
    )
    params = init_triad_model(model_cfg, jax.random.key(0))
    partition = ParamPartition(params)
    bank = OptimizerBank(optim_cfg, partition, total_updates=1000)
    factory = StepFactory(model_cfg, loss_cfg, optim_cfg, bank)
    state = init_train_state(params, bank, jax.random.key(1))

    rng = np.random.default_rng(0)
    av_batch = {
        "images": jnp.asarray(
            rng.normal(size=(B, 224, 224, 3)).astype(np.float32)
        ),
        "audio": jnp.asarray(
            (rng.normal(size=(B, AUDIO_SAMPLES)) * 0.1).astype(np.float32)
        ),
    }
    tv_batch = {
        "images": jnp.asarray(
            rng.normal(size=(B, 224, 224, 3)).astype(np.float32)
        ),
        "token_ids": jnp.asarray(
            rng.integers(1, 30_000, size=(B, TEXT_LEN)).astype(np.int32)
        ),
        "text_mask": jnp.ones((B, TEXT_LEN), jnp.float32),
    }

    step = factory.make_step("joint")
    one = jnp.float32(1.0)

    def chained(state, av, tv, n):
        def body(carry, _):
            state, c = carry
            av_i = {
                "images": av["images"] + c * 1e-12,
                "audio": av["audio"] + c * 1e-12,
            }
            tv_i = {
                "images": tv["images"] + c * 1e-12,
                "token_ids": jnp.where(
                    c > 1e30, tv["token_ids"] + 1, tv["token_ids"]
                ),
                "text_mask": tv["text_mask"],
            }
            state, metrics = step(state, av_i, tv_i, one, one)
            return (state, metrics["train_loss"]), None

        (state, loss), _ = jax.lax.scan(body, (state, jnp.float32(0.0)), None, length=n)
        return state, loss

    run = jax.jit(chained, static_argnames="n", donate_argnums=0)
    t0 = time.perf_counter()
    state, loss = run(state, av_batch, tv_batch, n=iters)
    float(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, loss = run(state, av_batch, tv_batch, n=iters)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"joint train step (B={B}, accum=1, loss={loss_impl}, "
        f"moments={moments}): "
        f"{dt * 1e3:.1f} ms ({B / dt:.1f} clips/s/chip; "
        f"compile {compile_s:.0f}s; loss {float(loss):.4f})"
    )


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
