"""Time the FULL 1000-way retrieval eval on real hardware (VERDICT r3
item 8): embed legs (the shipped embed_av_subset / embed_tv_subset
drivers, bs=8, jitted-once encoders + per-batch D2H fetch) plus all four
reference scoring directions (A->V, V->A, T->V, V->T — reference
retrieval.py:154-188, 250-292) through the vectorized blocked
score_matrix, at the reference's N=1000 protocol on the full-size model.

Also measures the per-pair aggregator cost the reference pays (its
double Python loop issues one device program per (i, j) pair,
retrieval.py:159-175) on a SMALL sample and extrapolates to N^2 pairs x
4 directions for contrast — the loop itself at N=1000 would take hours
through any dispatch path, which is exactly why it was replaced.

Inputs are synthetic (random pixels/waveforms/captions): this measures
throughput of the eval machinery, not model quality; decode cost is the
data pipeline's ledger (scripts/data_throughput.py).

Run: python scripts/tpu_retrieval_time.py [N] (default 1000)
Prints one JSON line per leg + a summary line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


class _SyntheticAV:
    """Duck-typed AV dataset for embed_av_subset: random pixels +
    variable-length waveforms (like real clips, 4-10 s at 16 kHz)."""

    def __init__(self, n: int, seed: int = 0):
        self.n = n
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, i: int, apply_augmentation: bool = True):
        rng = np.random.default_rng(self.seed + i)
        t = int(rng.integers(4 * 16000, 10 * 16000))
        return {
            "video_frames": rng.normal(size=(224, 224, 3)).astype(np.float32),
            "audio": (rng.normal(size=t) * 0.1).astype(np.float32),
        }


class _SyntheticTV:
    def __init__(self, n: int, seed: int = 1):
        self.n = n
        self.seed = seed
        self.words = [f"word{k}" for k in range(64)]

    def __len__(self):
        return self.n

    def caption(self, i: int) -> str:
        rng = np.random.default_rng(self.seed + i)
        k = int(rng.integers(3, 12))
        return " ".join(self.words[j] for j in rng.integers(0, 64, size=k))

    def __getitem__(self, i: int, apply_augmentation: bool = True):
        rng = np.random.default_rng(self.seed + i)
        img = rng.normal(size=(224, 224, 3)).astype(np.float32)
        return img, self.caption(i)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    print(f"# devices: {jax.devices()}", file=sys.stderr)

    from triad_tpu.core.config import perf_eval_model_config
    from triad_tpu.data.tokenizer import WordPieceTokenizer
    from triad_tpu.eval.retrieval import (
        at_retrieval_metrics,
        av_retrieval_metrics,
        embed_av_subset,
        embed_tv_subset,
        tv_retrieval_metrics,
    )
    from triad_tpu.models import TriadModel, init_triad_model

    cfg = perf_eval_model_config()
    model = TriadModel(cfg)
    params = init_triad_model(cfg, jax.random.key(0))
    audio_num_samples = 160_000
    max_text_tokens = 32

    @jax.jit
    def enc_av(params, images, audio):
        a = model.apply({"params": params}, audio, train=False,
                        method=TriadModel.encode_audio)
        v = model.apply({"params": params}, images, train=False,
                        method=TriadModel.encode_visual)
        return a, v

    @jax.jit
    def enc_tv(params, images, ids, mask):
        t = model.apply({"params": params}, ids, mask, train=False,
                        method=TriadModel.encode_text)
        v = model.apply({"params": params}, images, train=False,
                        method=TriadModel.encode_visual)
        return t, v

    av_ds = _SyntheticAV(n)
    tv_ds = _SyntheticTV(n)
    tok = WordPieceTokenizer.build_from_corpus(
        tv_ds.caption(i) for i in range(min(n, 256))
    )
    indices = list(range(n))

    # Warm the encoder compiles outside the clock (one bs=8 batch each).
    embed_av_subset(lambda im, au: enc_av(params, im, au), av_ds,
                    indices[:8], audio_num_samples,
                    num_tokens_fn=cfg.hubert.num_audio_tokens)
    embed_tv_subset(lambda im, i, m: enc_tv(params, im, i, m), tv_ds,
                    indices[:8], tok, max_text_tokens)

    t0 = time.perf_counter()
    a, am, v_av = embed_av_subset(
        lambda im, au: enc_av(params, im, au), av_ds, indices,
        audio_num_samples, num_tokens_fn=cfg.hubert.num_audio_tokens,
    )
    t_embed_av = time.perf_counter() - t0
    print(json.dumps({"leg": "embed_av", "n": n, "s": round(t_embed_av, 2),
                      "clips_per_s": round(n / t_embed_av, 1)}), flush=True)

    t0 = time.perf_counter()
    t, tm, v_tv = embed_tv_subset(
        lambda im, i, m: enc_tv(params, im, i, m), tv_ds, indices,
        tok, max_text_tokens,
    )
    t_embed_tv = time.perf_counter() - t0
    print(json.dumps({"leg": "embed_tv", "n": n, "s": round(t_embed_tv, 2),
                      "clips_per_s": round(n / t_embed_tv, 1)}), flush=True)

    temp = float(params["temperature"])

    # Scoring warm-up (compile the blocked program once per shape pair).
    av_retrieval_metrics(a[:32], am[:32], v_av[:32], temp)
    tv_retrieval_metrics(t[:32], tm[:32], v_tv[:32], temp)
    at_retrieval_metrics(a[:32], am[:32], t[:32], tm[:32], temp)

    t0 = time.perf_counter()
    m_av = av_retrieval_metrics(a, am, v_av, temp)
    t_av = time.perf_counter() - t0
    print(json.dumps({"leg": "score_av (A->V + V->A + recalls)", "n": n,
                      "s": round(t_av, 2), "r1_sanity": m_av["A->V_r1"]}),
          flush=True)

    t0 = time.perf_counter()
    m_tv = tv_retrieval_metrics(t, tm, v_tv, temp)
    t_tv = time.perf_counter() - t0
    print(json.dumps({"leg": "score_tv (T->V + V->T + recalls)", "n": n,
                      "s": round(t_tv, 2), "r1_sanity": m_tv["T->V_r1"]}),
          flush=True)

    t0 = time.perf_counter()
    at_retrieval_metrics(a, am, t, tm, temp)
    t_at = time.perf_counter() - t0
    print(json.dumps({"leg": "score_at (A->T + T->A, transitive extra)",
                      "n": n, "s": round(t_at, 2)}), flush=True)

    # Contrast: the reference's per-pair dispatch (retrieval.py:106-115,
    # one aggregator program per (i, j) pair), measured on a 16x16
    # sample and extrapolated to the 4 reference directions at N^2.
    @jax.jit
    def pair_agg(q, qm, k):
        s = (q @ k.T) / temp
        mx = jnp.max(s, axis=1)
        return jnp.sum(mx * qm) / jnp.maximum(jnp.sum(qm), 1e-7)

    qd = jnp.asarray(a[0])
    qmd = jnp.asarray(am[0])
    kd = jnp.asarray(v_av[0])
    float(pair_agg(qd, qmd, kd))  # compile
    sample = 256
    t0 = time.perf_counter()
    for i in range(16):
        for j in range(16):
            float(pair_agg(qd, qmd, kd))
    per_pair = (time.perf_counter() - t0) / sample
    loop_est_s = per_pair * (n * n) * 4
    print(json.dumps({
        "leg": "reference O(N^2) loop estimate (4 directions)",
        "per_pair_ms": round(per_pair * 1e3, 3),
        "est_hours": round(loop_est_s / 3600, 2),
    }), flush=True)

    total = t_embed_av + t_embed_tv + t_av + t_tv
    print(json.dumps({
        "metric": f"{n}-way retrieval e2e (embed + 4 directions)",
        "value": round(total, 1), "unit": "s",
        "embed_s": round(t_embed_av + t_embed_tv, 1),
        "score_4dir_s": round(t_av + t_tv, 1),
        "extra_at_s": round(t_at, 1),
        "vs_reference_loop_est_s": round(loop_est_s, 0),
    }), flush=True)


if __name__ == "__main__":
    main()
