"""Decide pallas_maxmean's fate at its DESIGN shapes (VERDICT round 1,
weak #3): the kernel was built for the DP regime — local queries x
GLOBAL keys (B_keys = 512 at global batch 512) — but was only ever
measured at B_keys=64, where it was neutral. This bench times the
chunked-scan XLA path vs the pallas kernel, fwd and fwd+bwd, at
Bq=64 x Bk=512 (and the old 64x64 for reference) on the real chip.

Run: python scripts/tpu_maxmean_dp_check.py [iters]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from triad_tpu.ops.similarity import aggregate_crossbatch

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = np.random.default_rng(0)
    Na, Nv, D = 499, 256, 512

    def bench(bq, bk, impl, chunk, mode):
        q = jnp.asarray(
            rng.normal(size=(bq, Na, D)).astype(np.float32), jnp.bfloat16
        )
        k = jnp.asarray(
            rng.normal(size=(bk, Nv, D)).astype(np.float32), jnp.bfloat16
        )
        t = jnp.float32(1.5)

        def fwd(q, k):
            agg = aggregate_crossbatch(
                q, k, t, clamp_min=-60.0, implementation=impl,
                chunk_size=chunk, compute_diag=False,
            )
            return jnp.sum(agg.clip_sims) + agg.nonneg_sq_sum

        fn = fwd if mode == "fwd" else jax.grad(
            lambda q, k: fwd(q, k), argnums=(0, 1)
        )

        def chain(q, k):
            def body(c, _):
                out = fn(q + c * 1e-6, k)
                leaf = (
                    out if mode == "fwd"
                    else jnp.sum(out[0][0, 0]) + jnp.sum(out[1][0, 0])
                )
                return leaf.astype(jnp.float32) * 1e-9, None

            return jax.lax.scan(body, jnp.float32(0), None, length=iters)[0]

        f = jax.jit(chain)
        t0 = time.perf_counter()
        float(f(q, k))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(q, k))
        dt = (time.perf_counter() - t0) / iters * 1000
        print(
            f"{impl:8s} chunk={chunk:3d} Bq={bq} Bk={bk} {mode:7s}: "
            f"{dt:7.2f} ms (compile {compile_s:.0f}s)",
            flush=True,
        )
        return dt

    for bk in (512, 64):
        for mode in ("fwd", "fwd+bwd"):
            for impl, chunk in (("chunked", 8), ("chunked", 16), ("pallas", 0)):
                try:
                    bench(64, bk, impl, chunk or 8, mode)
                except Exception as e:  # noqa: BLE001
                    print(f"{impl} Bk={bk} {mode}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
