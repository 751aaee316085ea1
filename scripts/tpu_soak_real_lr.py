"""Real-LR stability soak on GROUNDED synthetic data (VERDICT r3 item 3).

The record lacked one piece of positive evidence after two NaN
incidents (docs/TRAINING_PERF.md r3e/r3g): a long finite-loss run at
the PRODUCTION train config — perf kernel set (packed attention,
ragged-N, monolithic frontend, pallas posconv, xt), chunked_vjp loss at
chunk 32, device augmentation on, reference OneCycle at learning_rate
1e-4 — on data where learning provably works (the grounded square/tone/
word correspondence of tests/test_learning.py, here at full production
shapes: 224x224 images, 10 s audio, full-size backbones).

Both prior NaNs are explained (r3e: random-noise toy objective
divergence; r3g: the merged-train ragged composition, since fenced and
then cleared bit-exact by attnpad check 2) — this run is the positive
leg: >= N steps, loss finite at every step and decreasing overall.

Data path = production ingest: grounded AV clips packed into a
TriadPack shard read via raw_item (wire-dtype device augmentation),
grounded TV pairs written as jpg+txt under a LocalCaptionDataset (the
reference's CC3M-style layout, dataset.py:53-63).

Run: python scripts/tpu_soak_real_lr.py [steps] [workers] [batch]
Writes per-step losses to /tmp/soak_real_lr.jsonl; prints one summary
JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

AUDIO_SECS = 10.0
AUDIO_SAMPLES = int(AUDIO_SECS * 16_000)
TEXT_LEN = 8
IMAGE = 224
CLASSES = 8  # all grounded classes (_GROUNDED_WORDS)


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from triad_tpu.core.config import (
        LossConfig,
        ModelConfig,
        OptimConfig,
        apply_train_knobs,
    )
    from triad_tpu.data.datasets import (
        GroundedSyntheticAVDataset,
        GroundedSyntheticSpec,
        LocalCaptionDataset,
    )
    from triad_tpu.data.images import IMAGENET_MEAN, IMAGENET_STD
    from triad_tpu.data.packed import PackedAVDataset, pack_dataset
    from triad_tpu.data.pipeline import AVLoader, Prefetcher, TVLoader, cycling
    from triad_tpu.data.tokenizer import WordPieceTokenizer
    from triad_tpu.models import init_triad_model
    from triad_tpu.train.optim import OptimizerBank, ParamPartition
    from triad_tpu.train.step import StepFactory, init_train_state

    # The CODIFIED production train config (configs/v5e8_scale.yaml).
    from triad_tpu.core.config import perf_train_loss_config

    model_cfg = apply_train_knobs(ModelConfig(), {"perf"})
    loss_cfg = perf_train_loss_config()
    # Reference LR schedule at the real learning rate: OneCycle over the
    # soak's own horizon so the run covers warmup, PEAK 1e-4 and the
    # descent (pct_start 0.1, train.py:302-343 semantics). Backbone
    # unfreeze thresholds stay at the reference defaults (5000) — a
    # 500-step run is the reference's actual early-training regime
    # (LoRA + projections + temperature live, backbones gated).
    optim_cfg = OptimConfig(gradient_accumulation_steps=1)
    params = init_triad_model(model_cfg, jax.random.key(0))
    partition = ParamPartition(params)
    bank = OptimizerBank(optim_cfg, partition, total_updates=steps)
    factory = StepFactory(model_cfg, loss_cfg, optim_cfg, bank)
    state = init_train_state(params, bank, jax.random.key(1))
    step = jax.jit(factory.make_step("joint"), donate_argnums=0)
    one = jnp.float32(1.0)

    spec = GroundedSyntheticSpec(
        num_classes=CLASSES, image_size=IMAGE, patch_size=14
    )
    tmp = tempfile.mkdtemp(prefix="triad_soak_")
    try:
        # -- grounded AV -> TriadPack shard (production wire path) -----
        n_clips = 256
        src = GroundedSyntheticAVDataset(
            size=n_clips, audio_seconds=AUDIO_SECS, spec=spec, seed=0
        )
        path = os.path.join(tmp, "soak.tpack")
        t0 = time.perf_counter()
        pack_dataset(src, path, image_size=IMAGE, audio_samples=AUDIO_SAMPLES)
        print(
            f"# packed {n_clips} grounded clips in "
            f"{time.perf_counter() - t0:.1f}s",
            file=sys.stderr, flush=True,
        )
        av_ds = PackedAVDataset(path)
        av_loader = AVLoader(
            av_ds, batch_size=B, audio_num_samples=AUDIO_SAMPLES,
            num_workers=workers, worker_mode="thread", seed=0,
            device_augment=True,
        )

        # -- grounded TV -> jpg+txt LocalCaptionDataset layout ---------
        from PIL import Image

        cap_root = os.path.join(tmp, "caps", "a")
        os.makedirs(cap_root)
        mean = np.asarray(IMAGENET_MEAN, np.float32)
        std = np.asarray(IMAGENET_STD, np.float32)
        for i in range(n_clips):
            k = i % CLASSES
            rng = np.random.default_rng(31_337 + i)
            img = spec.image(k, rng)  # normalized floats
            pixels = np.clip(img * std + mean, 0.0, 1.0)
            Image.fromarray(
                np.round(pixels * 255.0).astype(np.uint8)
            ).save(os.path.join(cap_root, f"i{i}.jpg"), quality=95)
            with open(os.path.join(cap_root, f"i{i}.txt"), "w") as f:
                f.write(spec.word(k))
        tv_ds = LocalCaptionDataset(os.path.join(tmp, "caps"),
                                    image_size=IMAGE)
        tok = WordPieceTokenizer.build_from_corpus(
            [spec.word(k) for k in range(CLASSES)]
        )
        tv_loader = TVLoader(
            tv_ds, tok, B, max_text_tokens=TEXT_LEN, seed=0,
            num_workers=max(1, workers // 4), device_augment=True,
        )

        from triad_tpu.data.device_aug import (
            device_ingest_av,
            device_ingest_tv,
        )

        def put_av(b):
            out = device_ingest_av(b)
            return {"images": out["images"], "audio": out["audio"]}

        def put_tv(b):
            out = device_ingest_tv(b)
            return {
                "images": out["images"],
                "token_ids": out["token_ids"],
                "text_mask": out["text_mask"],
            }

        av_it = Prefetcher(
            cycling(lambda e, b: av_loader.epoch(e, b)), prefetch=4,
            device_put=put_av,
        )
        tv_it = Prefetcher(
            cycling(lambda e, b: tv_loader.epoch(e, b)), prefetch=4,
            device_put=put_tv,
        )

        log_path = "/tmp/soak_real_lr.jsonl"
        losses = []
        t_start = time.perf_counter()
        with open(log_path, "w") as log:
            for s in range(steps):
                state, metrics = step(state, next(av_it), next(tv_it),
                                      one, one)
                loss = float(metrics["train_loss"])
                losses.append(loss)
                rec = {
                    "step": s,
                    "loss": round(loss, 4),
                    "loss_av": round(float(metrics["loss_av"]), 4),
                    "loss_tv": round(float(metrics["loss_tv"]), 4),
                }
                log.write(json.dumps(rec) + "\n")
                if s % 25 == 0 or s == steps - 1:
                    log.flush()
                    print(f"# {json.dumps(rec)}", file=sys.stderr,
                          flush=True)
                if not np.isfinite(loss):
                    print(json.dumps({
                        "metric": "real-LR soak (grounded, production config)",
                        "ok": False, "nan_at_step": s,
                        "last_finite": losses[-2] if len(losses) > 1 else None,
                    }), flush=True)
                    raise SystemExit(1)
        wall = time.perf_counter() - t_start
        first = float(np.mean(losses[:20]))
        last = float(np.mean(losses[-20:]))
        print(json.dumps({
            "metric": "real-LR soak (grounded data, production config)",
            "ok": bool(np.all(np.isfinite(losses)) and last < first),
            "steps": steps,
            "loss_first20_mean": round(first, 3),
            "loss_last20_mean": round(last, 3),
            "loss_min": round(float(np.min(losses)), 3),
            "loss_max": round(float(np.max(losses)), 3),
            "clips_per_s_incl_ingest": round(2 * B * steps / wall, 1),
            "log": log_path,
        }), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
