"""ADVICE r4 item 1: re-verify the lax.scan bf16-transpose sharp edge
on the TPU backend.

The guard in ops/similarity.aggregate_crossbatch force-unrolls the
chunked loop at volume_dtype=bfloat16, citing scan-transpose producing
all-zero cotangents under jax.checkpoint (NaN without) for a bf16 dot
in the body. The advisor could not reproduce that on JAX 0.9.0 CPU.
This script differentiates the EXACT construct — the scanned
``_aggregate_chunked`` with unroll forced OFF — against the unrolled
form, plain and under jax.checkpoint, and reports whether the scan
gradients are zero/NaN/mismatched on whatever backend runs it.

Run on TPU:  python scripts/tpu_scan_bf16_check.py
Run on CPU:  JAX_PLATFORMS=cpu python scripts/tpu_scan_bf16_check.py
             (the image's sitecustomize pins the axon platform; pass
             ``cpu`` as argv[1] to force it from inside the script)
Prints one JSON line per (checkpoint, jit) combination.
"""

import json
import sys

sys.path.insert(0, ".")

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main() -> None:
    from triad_tpu.ops.similarity import _aggregate_chunked

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(8, 12, 128)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(8, 16, 128)).astype(np.float32))
    t = jnp.float32(1.5)

    def loss(unroll):
        def f(q, k):
            out = _aggregate_chunked(
                q, k, t, -60.0, None, 2, True, "default", unroll,
                "bfloat16",
            )
            return jnp.mean(out.clip_sims) + out.nonneg_sq_sum * 1e-3
        return f

    for ckpt in (False, True):
        for use_jit in (False, True):
            f_scan = loss(False)
            f_unroll = loss(True)
            if ckpt:
                f_scan = jax.checkpoint(f_scan)
                f_unroll = jax.checkpoint(f_unroll)
            g_scan_fn = jax.grad(f_scan, argnums=(0, 1))
            g_unroll_fn = jax.grad(f_unroll, argnums=(0, 1))
            if use_jit:
                g_scan_fn = jax.jit(g_scan_fn)
                g_unroll_fn = jax.jit(g_unroll_fn)
            gs = g_scan_fn(q, k)
            gu = g_unroll_fn(q, k)
            rep = {}
            for name, a, b in (("dq", gs[0], gu[0]), ("dk", gs[1], gu[1])):
                a = np.asarray(a, np.float32)
                b = np.asarray(b, np.float32)
                rep[name] = {
                    "scan_max_abs": round(float(np.abs(a).max()), 6),
                    "scan_finite": bool(np.isfinite(a).all()),
                    "scan_all_zero": bool((a == 0).all()),
                    "match_unrolled": bool(
                        np.allclose(a, b, rtol=1e-4, atol=1e-6)
                    ),
                }
            print(json.dumps({
                "backend": jax.default_backend(),
                "jax": jax.__version__,
                "checkpoint": ckpt, "jit": use_jit, **rep,
            }), flush=True)


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    main()
