"""Stage 3 of the r4 NaN bisect: the data-leg bisect proved the AV
audio ENCODER output goes NaN at step 0 on a real packed+device-ingested
batch (enc av.audio finite=False at pre-step params) while plain random
audio is clean at the same knobs/params/rng — so the NaN is a
data-dependent forward problem in the HuBERT path. This probe localizes
the first non-finite module.

  python scripts/tpu_nan_audio_probe.py [knobs] [npz] [mode]
    knobs: comma set for apply_train_knobs (default perf; '-' = parity)
    npz:   culprit batch (default /tmp/nan_culprit.npz, key av_audio);
           falls back to synthesized uniform audio matching the culprit
           stats (int16-quantized uniform +-0.347) when missing
    mode:  train|eval (dropout/SpecAugment live or not; default train,
           replicating the bisect's rng derivation exactly)

Steps: (1) full-batch audio-encoder forward -> per-row finiteness;
(2) re-run the worst rows with flax capture_intermediates -> first
non-finite module output, printed in call order.
"""

import json
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main() -> None:
    knobs = sys.argv[1] if len(sys.argv) > 1 else "perf"
    if knobs == "-":
        knobs = ""
    npz = sys.argv[2] if len(sys.argv) > 2 else "/tmp/nan_culprit.npz"
    mode = sys.argv[3] if len(sys.argv) > 3 else "train"
    # 5th arg "skip": stage 1 only (kernel-discrimination sweeps don't
    # need the module capture, and the B=2 re-run doesn't reproduce the
    # batch-layout-dependent NaN anyway).
    stage2 = sys.argv[4] if len(sys.argv) > 4 else "auto"

    from triad_tpu.core.config import ModelConfig, apply_train_knobs
    from triad_tpu.models import TriadModel, init_triad_model

    try:
        audio_np = np.load(npz)["av_audio"]
        src = npz
    except Exception:
        rng = np.random.default_rng(0)
        audio_np = (
            rng.integers(-11370, 11371, size=(64, 160_000)) / 32768.0
        ).astype(np.float32)
        src = "synthesized uniform int16-grid"
    print(f"# audio from {src}: shape={audio_np.shape} "
          f"std={audio_np.std():.4f} max={np.abs(audio_np).max():.4f}",
          file=sys.stderr, flush=True)

    cfg = apply_train_knobs(ModelConfig(), knobs)
    model = TriadModel(cfg)
    params = init_triad_model(cfg, jax.random.key(0))
    train = mode == "train"
    # Replicate the bisect's rng derivation: state.rng = key(1),
    # fold_in(global_step=0), split -> (rng_av, rng_tv).
    step_rng = jax.random.fold_in(jax.random.key(1), 0)
    rng_av, _rng_tv = jax.random.split(step_rng)

    audio = jnp.asarray(audio_np)

    # Audio path only: the full _encode_av runs the ViT whose
    # map_variables LoRA wrapper rejects capture_intermediates'
    # mutable-collection apply (flax ScopeCollectionNotFound). The NaN
    # is in the audio encoder (stage-2 bisect), so probe just it —
    # same normalize -> HuBERT -> projection path the step uses, and
    # the SAME rng stream the step hands the AV encode (rng_av).
    def _audio_only(model, audio, train):
        return model.encode_audio(audio, train=train)

    # params must be jit ARGUMENTS, not closure constants — closed-over
    # arrays serialize into the HLO and the tunnel's remote_compile
    # rejects the ~400 MB request (HTTP 413).
    @jax.jit
    def row_report(params, audio):
        out = model.apply(
            {"params": params}, audio, train,
            rngs={"dropout": rng_av}, method=_audio_only,
        )
        a = out.astype(jnp.float32)
        return (
            jnp.all(jnp.isfinite(a), axis=(1, 2)),
            jnp.max(jnp.abs(jnp.where(jnp.isfinite(a), a, 0.0)),
                    axis=(1, 2)),
        )

    fin, mx = row_report(params, audio)
    fin = np.asarray(fin)
    bad = np.flatnonzero(~fin)
    print(json.dumps({
        "metric": "audio rows non-finite", "knobs": knobs or "parity",
        "mode": mode, "bad_rows": int(bad.size), "of": int(fin.size),
        "first_bad": bad[:8].tolist(),
        "max_abs_finite": round(float(np.max(np.asarray(mx))), 3),
    }), flush=True)
    if bad.size == 0 or stage2 == "skip":
        return

    # ---- stage 2: capture_intermediates on the worst rows ------------
    rows = audio[bad[:4]]

    @jax.jit
    def probe(params, rows):
        _out, mods = model.apply(
            {"params": params}, rows, train,
            rngs={"dropout": rng_av}, method=_audio_only,
            capture_intermediates=lambda mdl, name: name == "__call__",
            mutable=["intermediates"],
        )
        rep = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            mods["intermediates"]
        ):
            name = jax.tree_util.keystr(path)
            if not hasattr(leaf, "astype"):
                continue
            x = leaf.astype(jnp.float32)
            rep[name] = (
                jnp.all(jnp.isfinite(x)),
                jnp.max(jnp.abs(jnp.where(jnp.isfinite(x), x, 0.0))),
            )
        return rep

    rep = probe(params, rows)
    items = [
        (nm, bool(f), float(m)) for nm, (f, m) in sorted(rep.items())
    ]
    for nm, f, m in items:
        flag = "OK " if f else "NAN"
        print(f"# {flag} max|x|={m:12.4e}  {nm}", flush=True)
    first_bad = [nm for nm, f, _ in items if not f]
    print(json.dumps({
        "metric": "first non-finite modules (path-sorted)",
        "nonfinite_modules": first_bad[:10],
    }), flush=True)


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    main()
