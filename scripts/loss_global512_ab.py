"""pallas_maxmean vs chunked-XLA scan at the kernel's DESIGN POINT
(VERDICT r2 item 8): per-chip queries B=64 against a global-batch-512
all-gathered key set — the shape each chip computes under DP at the
north-star config (parallel/dp.py row-block), NOT the single-chip B=64
x B=64 shape of the round-2 in-program A/B.

Times forward and forward+backward for both implementations on the real
chip (chained lax.scan, one readback), at AV shapes (Nq=499 audio
tokens, Nk=256 patches, D=512, bf16 features like the production loss
input). Prints one JSON line per measurement.

Run: python scripts/loss_global512_ab.py [iters] [impls] [modes]
  modes: comma set of {isolated, composed} (default both)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BQ = 64        # per-chip query clips
BK = 512       # global key set (all-gathered negatives)
NQ = 499       # 10 s audio tokens
NK = 256       # ViT patches
D = 512


def composed(iters: int, impls, chunk: int = 16) -> None:
    """In-PROGRAM composition at the DP design point: the full tri-modal
    eval forward at per-chip B=64 plus BOTH losses computed against a
    512-clip key set (the post-all-gather shape each chip sees under
    DP-8 at the north-star config). Round 2 showed composition can
    invert isolated verdicts (XLA overlaps the loss scan with encoder
    work at 64x64); this measures whether that still holds when the
    loss is 8x larger."""
    from triad_tpu.core.config import perf_eval_model_config
    from triad_tpu.models import TriadModel, init_triad_model
    from triad_tpu.ops.similarity import aggregate_crossbatch

    cfg = perf_eval_model_config()
    model = TriadModel(cfg)
    params = init_triad_model(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(BQ, 224, 224, 3)).astype(np.float32))
    audio = jnp.asarray(
        (rng.normal(size=(BQ, 160_000)) * 0.1).astype(np.float32)
    )
    token_ids = jnp.asarray(
        rng.integers(1, 30_000, size=(BQ, 32)).astype(np.int32)
    )
    text_mask = jnp.ones((BQ, 32), jnp.float32)
    # The all-gathered global key set (visual tokens of 512 clips).
    kv = jnp.asarray(
        rng.normal(size=(BK, NK, D)).astype(np.float32), jnp.bfloat16
    )

    for impl in impls:

        def row_infonce(agg):
            # Row-block CE against the global key set — what each chip
            # computes under DP with all-gathered negatives
            # (parallel/dp.py), labels at this chip's offset (0 here).
            s = agg.clip_sims
            lse = jax.nn.logsumexp(s, axis=1)
            pos = jnp.diagonal(s[:, :BQ])
            return jnp.mean(lse - pos) + agg.nonneg_sq_sum / agg.volume_numel

        def step(params, images, audio, token_ids, text_mask, kv, n):
            def body(c, _):
                out = model.apply(
                    {"params": params}, images + c * 1e-12,
                    audio + c * 1e-12,
                    jnp.where(c > 1e30, token_ids + 1, token_ids),
                    text_mask, train=False,
                )
                temp = params["temperature"]
                av = aggregate_crossbatch(
                    out["audio"], kv, temp, clamp_min=-60.0,
                    implementation=impl, chunk_size=chunk,
                    compute_diag=False, precision="default",
                )
                tv = aggregate_crossbatch(
                    out["text"], kv, temp, clamp_min=-20.0,
                    query_mask=text_mask, implementation=impl,
                    chunk_size=chunk, compute_diag=False, precision="default",
                )
                return row_infonce(av) + row_infonce(tv), None

            total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return total

        try:
            run = jax.jit(step, static_argnames="n")
            args = (params, images, audio, token_ids, text_mask, kv)
            float(run(*args, n=iters))
            t0 = time.perf_counter()
            val = float(run(*args, n=iters))
            dt = (time.perf_counter() - t0) / iters
            print(json.dumps({
                "impl": impl, "pass": f"composed eval fwd+loss vs 512 keys (chunk {chunk})",
                "ms": round(dt * 1e3, 2),
                "clips_per_s_chip": round(BQ / dt, 1),
                "check": round(val, 2),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "impl": impl, "pass": "composed",
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }), flush=True)


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    impls = (
        sys.argv[2].split(",") if len(sys.argv) > 2
        else ["chunked", "pallas"]
    )
    modes = (
        set(sys.argv[3].split(",")) if len(sys.argv) > 3
        else {"isolated", "composed"}
    )
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    if "composed" in modes:
        composed(iters, impls, chunk)
    if "isolated" not in modes:
        return
    from triad_tpu.ops.similarity import aggregate_crossbatch

    rng = np.random.default_rng(0)
    q = jnp.asarray(
        rng.normal(size=(BQ, NQ, D)).astype(np.float32), jnp.bfloat16
    )
    k = jnp.asarray(
        rng.normal(size=(BK, NK, D)).astype(np.float32), jnp.bfloat16
    )
    temp = jnp.float32(2.0)

    for impl in impls:
        kwargs = dict(
            clamp_min=-60.0, implementation=impl, chunk_size=chunk,
            compute_diag=False, precision="default",
        )

        def fwd(q, k, t):
            out = aggregate_crossbatch(q, k, t, **kwargs)
            return jnp.sum(out.clip_sims) + out.nonneg_sq_sum

        def fwd_chained(q, k, t, n):
            def body(c, _):
                return fwd(q + (c * 1e-12).astype(q.dtype), k, t), None

            total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return total

        def bwd_chained(q, k, t, n):
            g = jax.grad(fwd, argnums=(0, 1, 2))

            def body(c, _):
                dq, dk, dt = g(q + (c * 1e-12).astype(q.dtype), k, t)
                return dt + jnp.sum(dq[0, 0, :8].astype(jnp.float32)), None

            total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return total

        for name, fn in (("fwd", fwd_chained), ("fwd+bwd", bwd_chained)):
            try:
                run = jax.jit(fn, static_argnames="n")
                float(run(q, k, temp, n=iters))  # warm/compile
                t0 = time.perf_counter()
                val = float(run(q, k, temp, n=iters))
                dt = (time.perf_counter() - t0) / iters
                print(json.dumps({
                    "impl": impl, "pass": name,
                    "shape": f"q({BQ},{NQ},{D}) x k({BK},{NK},{D}) bf16",
                    "ms": round(dt * 1e3, 2),
                    "check": round(val, 2),
                }), flush=True)
            except Exception as e:  # noqa: BLE001 - record and continue
                print(json.dumps({
                    "impl": impl, "pass": name,
                    "error": f"{type(e).__name__}: {str(e)[:200]}",
                }), flush=True)


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    main()
