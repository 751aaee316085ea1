"""Stage 2 of the r4 NaN bisect (scripts/tpu_nan_bisect.py proved the
production joint step FINITE on plain random arrays at perf knobs, so
the e2e NaN needs the data path): run the production step on the
ingest harness's REAL loader batches, one leg at a time.

  python scripts/tpu_nan_data_bisect.py [av] [tv] [steps] [knobs]
    av: real|rand   AV leg = packed TriadPack + device augment, or the
                    plain random arrays that measured clean
    tv: real|rand   TV leg = file-backed LocalCaptionDataset + device
                    augment (the one leg every NaN run shares), or rand
    steps (default 8), knobs (default perf)

Per step prints loss split + grad norms + nonfinite metric names. At
the first non-finite step it re-runs per-pair forensics ON THE CULPRIT
BATCH at the pre-step params: encoder output finiteness per modality,
then av-only / tv-only loss+grad finiteness, and dumps the batch to
/tmp/nan_culprit.npz for offline analysis.
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

B = 64
AUDIO_SECS = 10.0
AUDIO_SAMPLES = int(AUDIO_SECS * 16_000)
TEXT_LEN = 32
IMAGE = 224


def main() -> None:
    av_mode = sys.argv[1] if len(sys.argv) > 1 else "real"
    tv_mode = sys.argv[2] if len(sys.argv) > 2 else "real"
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    knobs = sys.argv[4] if len(sys.argv) > 4 else "perf"

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
    loss_cfg = LossConfig(
        implementation="chunked", chunk_size=16, matmul_precision="default"
    )
    optim_cfg = OptimConfig(gradient_accumulation_steps=1, learning_rate=1e-6)
    params = init_triad_model(model_cfg, jax.random.key(0))
    partition = ParamPartition(params)
    bank = OptimizerBank(optim_cfg, partition, total_updates=10_000)
    factory = StepFactory(model_cfg, loss_cfg, optim_cfg, bank)
    state = init_train_state(params, bank, jax.random.key(1))
    # NO donation here (unlike the e2e harness): the pre-step params
    # must survive the culprit step for forensics.
    step = jax.jit(factory.make_step("joint"))
    one = jnp.float32(1.0)

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="triad_nan_bisect_")
    closers = []
    try:
        # ---- AV leg --------------------------------------------------
        if av_mode == "real":
            from triad_tpu.data.datasets import SyntheticAVDataset
            from triad_tpu.data.device_aug import device_ingest_av
            from triad_tpu.data.packed import PackedAVDataset, pack_dataset
            from triad_tpu.data.pipeline import AVLoader, Prefetcher, cycling

            src = SyntheticAVDataset(
                size=256, image_size=IMAGE, audio_seconds=AUDIO_SECS
            )
            path = os.path.join(tmp, "e2e.tpack")
            pack_dataset(
                src, path, image_size=IMAGE, audio_samples=AUDIO_SAMPLES
            )
            av_loader = AVLoader(
                PackedAVDataset(path), batch_size=B,
                audio_num_samples=AUDIO_SAMPLES, num_workers=4,
                worker_mode="thread", seed=0, device_augment=True,
            )

            def put_av(b):
                out = device_ingest_av(b)
                return {"images": out["images"], "audio": out["audio"]}

            av_it = Prefetcher(
                cycling(lambda e, b: av_loader.epoch(e, b)), prefetch=2,
                device_put=put_av,
            )
            closers.append(av_it.close)
            next_av = lambda: next(av_it)
        else:
            def next_av():
                return {
                    "images": jnp.asarray(
                        rng.normal(size=(B, 224, 224, 3)).astype(np.float32)
                    ),
                    "audio": jnp.asarray(
                        (rng.normal(size=(B, AUDIO_SAMPLES)) * 0.1).astype(
                            np.float32
                        )
                    ),
                }

        # ---- TV leg --------------------------------------------------
        if tv_mode == "real":
            from PIL import Image

            from triad_tpu.data.datasets import LocalCaptionDataset
            from triad_tpu.data.device_aug import device_ingest_tv
            from triad_tpu.data.pipeline import Prefetcher, TVLoader, cycling
            from triad_tpu.data.tokenizer import WordPieceTokenizer

            cap_root = os.path.join(tmp, "caps", "a")
            os.makedirs(cap_root)
            rng0 = np.random.default_rng(1)
            for i in range(256):
                arr = rng0.integers(
                    0, 256, size=(IMAGE, IMAGE, 3)
                ).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(cap_root, f"i{i}.jpg"), quality=90
                )
                with open(os.path.join(cap_root, f"i{i}.txt"), "w") as f:
                    f.write(f"synthetic caption number {i}")
            tv_ds = LocalCaptionDataset(
                os.path.join(tmp, "caps"), image_size=IMAGE
            )
            tok = WordPieceTokenizer.build_from_corpus(
                [f"synthetic caption number {i}" for i in range(64)]
            )
            tv_loader = TVLoader(
                tv_ds, tok, B, max_text_tokens=TEXT_LEN, seed=0,
                num_workers=2, device_augment=True,
            )

            def put_tv(b):
                out = device_ingest_tv(b)
                return {
                    "images": out["images"],
                    "token_ids": out["token_ids"],
                    "text_mask": out["text_mask"],
                }

            tv_it = Prefetcher(
                cycling(lambda e, b: tv_loader.epoch(e, b)), prefetch=2,
                device_put=put_tv,
            )
            closers.append(tv_it.close)
            next_tv = lambda: next(tv_it)
        else:
            def next_tv():
                return {
                    "images": jnp.asarray(
                        rng.normal(size=(B, 224, 224, 3)).astype(np.float32)
                    ),
                    "token_ids": jnp.asarray(
                        rng.integers(1, 30_000, size=(B, TEXT_LEN)).astype(
                            np.int32
                        )
                    ),
                    "text_mask": jnp.ones((B, TEXT_LEN), jnp.float32),
                }

        # ---- forensics helpers (compiled lazily on first NaN) --------
        def pair_forensics(pre_params, av_b, tv_b, pre_rng, gstep):
            """Which pair NaNs at the culprit state/batch? Per-modality
            encoder outputs, then per-pair loss+grad finiteness. All
            jitted (eager per-op dispatch is unusable over the tunnel)."""
            step_rng = jax.random.fold_in(pre_rng, gstep)
            from triad_tpu.train.step import _encode_av, _encode_tv

            @jax.jit
            def enc_report(p, av_b, tv_b):
                rng_av, rng_tv = jax.random.split(step_rng)
                fa = factory.model.apply(
                    {"params": p}, av_b["images"], av_b["audio"],
                    train=True, rngs={"dropout": rng_av}, method=_encode_av,
                )
                ft = factory.model.apply(
                    {"params": p}, tv_b["images"],
                    tv_b["token_ids"], tv_b["text_mask"], train=True,
                    rngs={"dropout": rng_tv}, method=_encode_tv,
                )
                rep = {}
                for nm, x in (
                    ("av.visual", fa["visual"]), ("av.audio", fa["audio"]),
                    ("tv.visual", ft["visual"]), ("tv.text", ft["text"]),
                ):
                    xf = x.astype(jnp.float32)
                    rep[nm] = (
                        jnp.all(jnp.isfinite(xf)),
                        jnp.max(jnp.abs(xf)),
                    )
                return rep

            for nm, (fin, mx) in enc_report(pre_params, av_b, tv_b).items():
                print(f"# enc {nm}: finite={bool(fin)} "
                      f"max|x|={float(mx):.3e}", flush=True)

            for pair in ("av", "tv"):
                @jax.jit
                def pair_loss_grads(p, av_b, tv_b, _pair=pair):
                    def lf(pp):
                        tot, _ = factory.compute_losses(
                            pp,
                            av_b if _pair == "av" else None,
                            tv_b if _pair == "tv" else None,
                            step_rng, one, one,
                        )
                        return tot

                    val, grads = jax.value_and_grad(lf)(p)
                    gfin = jnp.all(jnp.asarray([
                        jnp.all(jnp.isfinite(g.astype(jnp.float32)))
                        for g in jax.tree.leaves(grads)
                    ]))
                    return val, gfin

                val, gfin = pair_loss_grads(pre_params, av_b, tv_b)
                print(f"# pair {pair}: loss={float(val):.4f} "
                      f"grads_finite={bool(gfin)}", flush=True)

        # ---- run -----------------------------------------------------
        bad = None
        for s in range(steps):
            av_b, tv_b = next_av(), next_tv()
            pre_params = state.params
            pre_rng, gstep = state.rng, state.global_step
            state, metrics = step(state, av_b, tv_b, one, one)
            vals = {
                k: float(v) for k, v in metrics.items()
                if hasattr(v, "shape") and v.shape == ()
            }
            nonfinite = sorted(
                k for k, v in vals.items() if not np.isfinite(v)
            )
            print(json.dumps({
                "step": s,
                "loss_av": round(vals.get("loss_av", 0.0), 4),
                "loss_tv": round(vals.get("loss_tv", 0.0), 4),
                "grad_norms": {
                    k.removeprefix("grad_norm_"): round(vals[k], 2)
                    for k in vals if k.startswith("grad_norm_")
                },
                "nonfinite": nonfinite,
            }), flush=True)
            if nonfinite and bad is None:
                bad = s
                np.savez(
                    "/tmp/nan_culprit.npz",
                    **{f"av_{k}": np.asarray(v) for k, v in av_b.items()},
                    **{f"tv_{k}": np.asarray(v) for k, v in tv_b.items()},
                )
                print(f"# culprit batch saved (/tmp/nan_culprit.npz); "
                      f"running pair forensics at pre-step params",
                      flush=True)
                pair_forensics(pre_params, av_b, tv_b, pre_rng, gstep)
                break

        print(json.dumps({
            "metric": "nan data bisect", "av": av_mode, "tv": tv_mode,
            "knobs": knobs, "steps": steps, "first_nonfinite_step": bad,
            "ok": bad is None,
        }), flush=True)
    finally:
        for c in closers:
            c()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    main()
