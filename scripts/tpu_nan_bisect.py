"""Bisect the r4a ingest-e2e NaN (first update NaNs at lr=1e-6 on BOTH
kernel sets, inputs finite — docs/TRAINING_PERF.md r4 block).

Runs the production joint train step on PLAIN random device arrays (no
loaders, no devaug — if this NaNs, the data pipeline is exonerated) and
prints EVERY step metric with finiteness, including the per-group grad
norms and the av/tv loss split the e2e harness never surfaced.

Run: python scripts/tpu_nan_bisect.py [knobs] [mode] [steps] [dropout]
  knobs   comma-set for core.config.apply_train_knobs (default "perf";
          "perf,pad128" = perf minus ragged-N attention)
  mode    joint | av | tv  (default joint)
  steps   update count (default 6)
  dropout "default" | "off" (zero every model dropout — isolates the
          live-dropout kernels from the rest of the train graph)
Prints one JSON line per step + a final verdict line.
"""

import dataclasses
import json
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

B = 64
AUDIO_SAMPLES = 160_000
TEXT_LEN = 32


def main() -> None:
    knobs = sys.argv[1] if len(sys.argv) > 1 else "perf"
    mode = sys.argv[2] if len(sys.argv) > 2 else "joint"
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    drop = sys.argv[4] if len(sys.argv) > 4 else "default"

    from triad_tpu.core.config import (
        LossConfig,
        ModelConfig,
        OptimConfig,
        apply_train_knobs,
    )
    from triad_tpu.models import init_triad_model
    from triad_tpu.train.optim import OptimizerBank, ParamPartition
    from triad_tpu.train.step import StepFactory, init_train_state

    model_cfg = apply_train_knobs(ModelConfig(), knobs)
    if drop == "off":
        model_cfg = dataclasses.replace(
            model_cfg,
            hubert=dataclasses.replace(
                model_cfg.hubert, hidden_dropout=0.0,
                activation_dropout=0.0, attention_dropout=0.0,
                feat_proj_dropout=0.0,
            ),
            text=dataclasses.replace(
                model_cfg.text, dropout=0.0, attention_dropout=0.0
            ),
            visual_dropout_prob=0.0,
        )
    # == the e2e harness's loss/optim config (ingest_train_e2e.py)
    loss_cfg = LossConfig(
        implementation="chunked", chunk_size=16, matmul_precision="default"
    )
    optim_cfg = OptimConfig(gradient_accumulation_steps=1, learning_rate=1e-6)
    params = init_triad_model(model_cfg, jax.random.key(0))
    partition = ParamPartition(params)
    bank = OptimizerBank(optim_cfg, partition, total_updates=10_000)
    factory = StepFactory(model_cfg, loss_cfg, optim_cfg, bank)
    state = init_train_state(params, bank, jax.random.key(1))
    step = jax.jit(factory.make_step(mode), donate_argnums=0)
    one = jnp.float32(1.0)

    # 4 cycling random batches (the e2e harness cycles 256 clips / 64).
    rng = np.random.default_rng(0)
    avs, tvs = [], []
    for _ in range(4):
        avs.append({
            "images": jnp.asarray(
                rng.normal(size=(B, 224, 224, 3)).astype(np.float32)
            ),
            "audio": jnp.asarray(
                (rng.normal(size=(B, AUDIO_SAMPLES)) * 0.1).astype(
                    np.float32
                )
            ),
        })
        tvs.append({
            "images": jnp.asarray(
                rng.normal(size=(B, 224, 224, 3)).astype(np.float32)
            ),
            "token_ids": jnp.asarray(
                rng.integers(1, 30_000, size=(B, TEXT_LEN)).astype(np.int32)
            ),
            "text_mask": jnp.ones((B, TEXT_LEN), jnp.float32),
        })

    bad_step = None
    for s in range(steps):
        state, metrics = step(state, avs[s % 4], tvs[s % 4], one, one)
        vals = {
            k: float(v)
            for k, v in metrics.items()
            if hasattr(v, "shape") and v.shape == ()
        }
        nonfinite = sorted(
            k for k, v in vals.items() if not np.isfinite(v)
        )
        print(json.dumps({
            "step": s,
            "loss": round(vals.get("train_loss", float("nan")), 4),
            "loss_av": round(vals.get("loss_av", float("nan")), 4),
            "loss_tv": round(vals.get("loss_tv", float("nan")), 4),
            "grad_norms": {
                k.removeprefix("grad_norm_"): round(vals[k], 4)
                for k in vals if k.startswith("grad_norm_")
            },
            "nonfinite": nonfinite,
        }), flush=True)
        if nonfinite and bad_step is None:
            bad_step = s
            bad_params = [
                str(p)
                for p, v in jax.tree_util.tree_leaves_with_path(state.params)
                if jnp.issubdtype(v.dtype, jnp.floating)
                and not bool(jnp.all(jnp.isfinite(v)))
            ]
            print(json.dumps({
                "forensics_step": s,
                "nonfinite_param_leaves": len(bad_params),
                "first": bad_params[:4],
            }), flush=True)

    print(json.dumps({
        "metric": "nan bisect",
        "knobs": knobs, "mode": mode, "dropout": drop,
        "steps": steps,
        "first_nonfinite_step": bad_step,
        "ok": bad_step is None,
    }), flush=True)


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    main()
