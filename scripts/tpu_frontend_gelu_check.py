"""Time the monolithic pallas frontend's GELU variants on-chip.

The kernel is VPU-bound (~25 ms of in-kernel elementwise vs ~5 ms HBM
floor); this probe isolates how much of that is the activation:
  erf          A&S 7.1.26 rational (exp + divide), fp32 transient
  tanh         tanh-form GELU, fp32 transient (max abs err 4.7e-4)
  tanh_native  tanh-form at bf16 (packed VPU ops)
  id           no activation — the floor (invalid numerics)

Run: python scripts/tpu_frontend_gelu_check.py [variants...]
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

    from triad_tpu.ops import pallas_frontend as mf

    variants = sys.argv[1:] or ["erf", "tanh", "tanh_native", "id"]
    B, T = 64, 160_000
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
    w0 = jnp.asarray(
        (rng.normal(size=(10, 1, 512)) * 0.45).astype(np.float32)
    )
    gs = jnp.asarray((rng.normal(size=(512,)) * 0.2 + 1.0).astype(np.float32))
    gb = jnp.asarray((rng.normal(size=(512,)) * 0.1).astype(np.float32))
    ws = [
        jnp.asarray(
            (rng.normal(size=(k, 512, 512)) * (2 / (k * 512)) ** 0.5).astype(
                np.float32
            )
        )
        for k in (3, 3, 3, 3, 2, 2)
    ]

    def timed(fn, label, iters=10):
        f = jax.jit(
            lambda w: jax.lax.scan(
                lambda c, _: (
                    fn(w + c * 1e-6).astype(jnp.float32)[:, 0, 0].sum()
                    * 1e-9,
                    None,
                ),
                jnp.float32(0.0), None, length=iters,
            )[0]
        )
        t0 = time.perf_counter()
        float(f(wave))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(wave))
        dt = (time.perf_counter() - t0) / iters * 1000
        print(f"{label}: {dt:.2f} ms/call (compile {compile_s:.0f}s)")
        return dt

    ref = None
    for v in variants:
        out = mf.monolithic_frontend(
            wave[:4], w0, gs, gb, ws, tb=64, out_dtype=jnp.bfloat16, gelu=v
        )
        if v == "erf":
            ref = np.asarray(out, np.float32)
        elif ref is not None and v != "id":
            d = np.abs(np.asarray(out, np.float32) - ref)
            print(f"{v}: max abs diff vs erf {d.max():.5f} "
                  f"(scale {np.abs(ref).max():.3f})")
        timed(
            lambda w, v=v: mf.monolithic_frontend(
                w, w0, gs, gb, ws, tb=64, out_dtype=jnp.bfloat16, gelu=v
            ),
            f"monolithic gelu={v}",
        )


if __name__ == "__main__":
    main()
